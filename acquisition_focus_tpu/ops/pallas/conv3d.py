"""Pallas TPU kernel: direct 3^3 stride-1 SAME 3D convolution (forward).

Targets the hybrid U-Net decoder's large-volume conv levels, where XLA's
conv lowering reaches 13-16 TF/s (measured; dec0's Co=48 fills 37% of the MXU
lane dim). Structure (respecting every Mosaic constraint learned on this chip
— PERF.md):

* the operand is zero-padded (z/y halo, channels to whole 128-lane tiles) and
  the (H+2, W) plane is FLATTENED in XLA so that TY=4 consecutive output rows
  are sublane-contiguous: each tap contributes ONE (TY*W=512, Ci) x (Ci, Co)
  dot with a *static* sublane offset dy*W+dx — M=512 spans 4 MXU tiles per
  pass instead of 1, and no in-kernel reshape is ever needed;
* flattening makes the x-halo wrap: at tap dx=+-1 the row-edge points read the
  neighbouring row's first/last element instead of the zero pad. SAME zero
  padding means the TRUE contribution at those points is exactly zero, so the
  shifted operand is multiplied by a static (P, 1) row mask that zeroes the
  edge rows — one VPU multiply per edge tap, no correction matmuls;
* per grid step a (TZ+2, (TY+3)*W, Cp) halo window is DMAd to VMEM
  (double-buffered across steps; the extra leading W rows keep all static
  offsets non-negative).

The kernel is forward-only; ``conv3d`` below wires it via jax.custom_vjp with
the standard XLA convolution gradients (built with jax.linear_transpose, so no
second forward is ever traced). Contractions run in the input dtype with f32
accumulation (bf16 inputs -> bf16 MXU passes; f32 inputs -> Precision.HIGHEST).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TZ = 8     # output z rows per grid step
TY = 4     # output y rows per grid step (TY*W is the M dim of each tap dot)


def supports_conv3d(x_shape, w_shape):
    """Static dispatch guard: (B, D, H, W, Ci) input, (3, 3, 3, Ci, Co) kernel."""
    if len(x_shape) != 5 or len(w_shape) != 5:
        return False
    B, D, H, W, Ci = x_shape
    if tuple(w_shape[:3]) != (3, 3, 3) or w_shape[3] != Ci:
        return False
    # W is the sublane run length: full lane tiles on M; D/H must tile the grid.
    return W % 128 == 0 and D % TZ == 0 and H % TY == 0


def _edge_masks(W, dtype):
    """(P, 1) row masks: [0] zeroes x==0 rows (dx=-1 wrap), [1] zeroes
    x==W-1 rows (dx=+1 wrap). The flat-plane wrap reads land exactly on these
    rows, where SAME zero padding makes the true contribution zero. Built with
    integer min() instead of bool compares: large i1 vectors hit a Mosaic
    relayout bug on this chip (PERF.md, round-1 volume-kernel note)."""
    P = TY * W
    col = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0) % W
    mask_l = jnp.minimum(col, 1).astype(dtype)              # 0 iff col == 0
    mask_r = jnp.minimum(W - 1 - col, 1).astype(dtype)      # 0 iff col == W-1
    return mask_l, mask_r


def _window_dma(x_ref, scratch, sems, nz, ny, W, win):
    """Double-buffered halo-window DMA shared by the fwd and wgrad kernels."""
    def dma(g_, slot):
        b_ = g_ // (nz * ny)
        z_ = (g_ // ny) % nz
        y_ = g_ % ny
        return pltpu.make_async_copy(
            x_ref.at[b_, pl.ds(z_ * TZ, TZ + 2), pl.ds(y_ * TY * W, win)],
            scratch.at[slot],
            sems.at[slot],
        )
    return dma


def _kernel(x_ref, w_ref, out_ref, scratch, sems, *, W, Cp, Co,
            nz, ny, n_total, precision, dtype):
    P = TY * W
    win = (TY + 3) * W + 8     # +8: the (dy=2, dx=+1) window needs one extra row
    b = pl.program_id(0)
    zi = pl.program_id(1)
    yi = pl.program_id(2)
    g = (b * nz + zi) * ny + yi

    dma = _window_dma(x_ref, scratch, sems, nz, ny, W, win)
    slot = jax.lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        dma(g, slot).start()

    @pl.when(g + 1 < n_total)
    def _():
        dma(g + 1, 1 - slot).start()

    dma(g, slot).wait()

    def dot(a, bmat):
        return jax.lax.dot_general(a, bmat, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=precision)

    mask_l, mask_r = _edge_masks(W, scratch.dtype)

    for z in range(TZ):
        acc = jnp.zeros((P, Co), jnp.float32)
        for dz in range(3):
            for dy in range(3):
                base = W + dy * W          # window-relative row of (r=0, x=0)
                for dx in (-1, 0, 1):
                    tap = w_ref[(dz * 3 + dy) * 3 + (dx + 1)]
                    sl = scratch[slot, z + dz, base + dx:base + dx + P, :]
                    if dx == 1:
                        sl = sl * mask_r
                    elif dx == -1:
                        sl = sl * mask_l
                    acc = acc + dot(sl, tap)
        out_ref[0, z] = acc.astype(out_ref.dtype)


@jax.jit
def conv3d_pallas(x, w):
    """3^3 stride-1 SAME conv, channels-last: (B, D, H, W, Ci) x (3,3,3,Ci,Co)
    -> (B, D, H, W, Co) in x.dtype."""
    B, D, H, W, Ci = x.shape
    Co = w.shape[4]
    assert supports_conv3d(x.shape, w.shape), (x.shape, w.shape)

    # zero halo on z/y, channels padded to whole lane tiles, then the (H+2, W)
    # plane flattened with W extra leading zero rows so all static window
    # offsets are non-negative. Padded voxels/channels are zero.
    Cp = -(-Ci // 128) * 128
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0), (0, Cp - Ci)))
    xp = xp.reshape(B, D + 2, (H + 2) * W, Cp)
    xp = jnp.pad(xp, ((0, 0), (0, 0), (W, 8), (0, 0)))
    w_flat = jnp.pad(w.astype(x.dtype), ((0, 0),) * 3 + ((0, Cp - Ci), (0, 0)))
    w_flat = w_flat.reshape(27, Cp, Co)
    precision = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)

    nz, ny = D // TZ, H // TY
    out = pl.pallas_call(
        partial(_kernel, W=W, Cp=Cp, Co=Co, nz=nz, ny=ny,
                n_total=B * nz * ny, precision=precision, dtype=x.dtype),
        out_shape=jax.ShapeDtypeStruct((B * nz * ny, TZ, TY * W, Co), x.dtype),
        grid=(B, nz, ny),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),    # padded flat operand
            pl.BlockSpec(memory_space=pltpu.VMEM),   # (27, Cp, Co) weights
        ],
        out_specs=pl.BlockSpec(
            (1, TZ, TY * W, Co),
            lambda b, zi, yi: ((b * nz + zi) * ny + yi, 0, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, TZ + 2, (TY + 3) * W + 8, Cp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(xp, w_flat)

    # un-tile: (B*nz*ny, TZ, TY*W, Co) -> (B, D, H, W, Co)
    out = out.reshape(B, nz, ny, TZ, TY, W, Co)
    out = jnp.transpose(out, (0, 1, 3, 2, 4, 5, 6))
    return out.reshape(B, D, H, W, Co)


def _wgrad_kernel(x_ref, g_ref, out_ref, scratch, sems, *, W, Cp, Co,
                  nz, ny, n_total, precision):
    """dL/dw: for each tap, contract the shifted operand window against the
    cotangent tile over all P points, accumulating (27, Cp, Co) across the
    whole grid (constant-index output block). This is XLA's weakest conv
    piece (7-16 TF/s measured): here every tap is one (Cp, P=512) x (P, Co)
    MXU pass with a K=512 contraction."""
    P = TY * W
    win = (TY + 3) * W + 8
    b = pl.program_id(0)
    zi = pl.program_id(1)
    yi = pl.program_id(2)
    gi = (b * nz + zi) * ny + yi

    dma = _window_dma(x_ref, scratch, sems, nz, ny, W, win)
    slot = jax.lax.rem(gi, 2)

    @pl.when(gi == 0)
    def _():
        dma(gi, slot).start()

    @pl.when(gi + 1 < n_total)
    def _():
        dma(gi + 1, 1 - slot).start()

    dma(gi, slot).wait()

    def dot_t(a, bmat):    # (P, Cp) x (P, Co) -> (Cp, Co), contract over P
        return jax.lax.dot_general(a, bmat, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=precision)

    mask_l, mask_r = _edge_masks(W, g_ref.dtype)
    gz = [g_ref[0, z] for z in range(TZ)]

    accs = [None] * 27
    for dx in (-1, 0, 1):
        # masking the cotangent zeroes the flat-wrap points, where the true
        # operand contribution is the SAME zero pad (mirror of the fwd masks)
        if dx == 1:
            gv = [v * mask_r for v in gz]
        elif dx == -1:
            gv = [v * mask_l for v in gz]
        else:
            gv = gz
        for dz in range(3):
            for dy in range(3):
                base = W + dy * W
                acc = jnp.zeros((Cp, Co), jnp.float32)
                for z in range(TZ):
                    sl = scratch[slot, z + dz, base + dx:base + dx + P, :]
                    acc = acc + dot_t(sl, gv[z])
                accs[(dz * 3 + dy) * 3 + dx + 1] = acc

    @pl.when(gi == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    for i in range(27):
        out_ref[i] = out_ref[i] + accs[i]


@jax.jit
def conv3d_wgrad_pallas(x, g):
    """Weight gradient of the 3^3 SAME conv: (B, D, H, W, Ci) operand and
    (B, D, H, W, Co) cotangent -> (3, 3, 3, Ci, Co) float32."""
    B, D, H, W, Ci = x.shape
    Co = g.shape[4]
    assert g.shape[:4] == x.shape[:4] and g.dtype == x.dtype, (x.shape, g.shape)
    assert supports_conv3d(x.shape, (3, 3, 3, Ci, Co))

    Cp = -(-Ci // 128) * 128
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0), (0, Cp - Ci)))
    xp = xp.reshape(B, D + 2, (H + 2) * W, Cp)
    xp = jnp.pad(xp, ((0, 0), (0, 0), (W, 8), (0, 0)))
    gf = g.reshape(B, D, H * W, Co)
    precision = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)

    nz, ny = D // TZ, H // TY
    dw = pl.pallas_call(
        partial(_wgrad_kernel, W=W, Cp=Cp, Co=Co, nz=nz, ny=ny,
                n_total=B * nz * ny, precision=precision),
        out_shape=jax.ShapeDtypeStruct((27, Cp, Co), jnp.float32),
        grid=(B, nz, ny),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),    # padded flat operand
            pl.BlockSpec((1, TZ, TY * W, Co),
                         lambda b, zi, yi: (b, zi, yi, 0),
                         memory_space=pltpu.VMEM),   # cotangent tile
        ],
        out_specs=pl.BlockSpec((27, Cp, Co), lambda b, zi, yi: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, TZ + 2, (TY + 3) * W + 8, Cp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(xp, gf)
    return dw[:, :Ci, :].reshape(3, 3, 3, Ci, Co)


def _xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), 'SAME',
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))


@jax.custom_vjp
def conv3d(x, w):
    """3^3 SAME conv with the Pallas forward and XLA gradients.

    Gradients are the transposes of the (linear-in-each-operand) XLA conv,
    built with jax.linear_transpose — identical to what jax.grad of the XLA
    conv produces, with no extra forward in the trace."""
    return conv3d_pallas(x, w)


def _conv3d_fwd(x, w):
    return conv3d_pallas(x, w), (x, w)


def _conv3d_bwd(res, g):
    x, w = res
    dx = jax.linear_transpose(lambda x_: _xla_conv(x_, w), x)(g)[0]
    dw = jax.linear_transpose(lambda w_: _xla_conv(x, w_), w)(g)[0]
    return dx, dw


conv3d.defvjp(_conv3d_fwd, _conv3d_bwd)


@jax.custom_vjp
def conv3d_pg(x, w):
    """3^3 SAME conv with Pallas forward AND Pallas gradients:

    * dx is itself a 3^3 SAME conv of the cotangent with the spatially flipped
      IO-swapped kernel — the forward Pallas kernel handles it directly;
    * dw runs the dedicated wgrad kernel (XLA's weakest piece).
    Falls back to the XLA transposes per-piece when a shape doesn't qualify.
    """
    return conv3d_pallas(x, w)


def _conv3d_pg_bwd(res, g):
    x, w = res
    w_t = jnp.flip(w, (0, 1, 2)).swapaxes(3, 4)
    if supports_conv3d(g.shape, w_t.shape):
        dx = conv3d_pallas(g, w_t.astype(g.dtype)).astype(x.dtype)
    else:
        dx = jax.linear_transpose(lambda x_: _xla_conv(x_, w), x)(g)[0]
    if supports_conv3d(x.shape, w.shape) and g.dtype == x.dtype:
        dw = conv3d_wgrad_pallas(x, g).astype(w.dtype)
    else:
        dw = jax.linear_transpose(lambda w_: _xla_conv(x, w_), w)(g)[0]
    return dx, dw


conv3d_pg.defvjp(_conv3d_fwd, _conv3d_pg_bwd)


@jax.custom_vjp
def conv3d_wg(x, w):
    """3^3 SAME conv: Pallas forward + Pallas WEIGHT grad, XLA input grad.

    Motivation (PERF.md round 3): standalone, XLA's wgrad (29 ms on dec0a)
    beats the Pallas wgrad kernel (38 ms) — but *inside the training step* the
    XLA wgrad runs in a fusion context at ~16 TF/s (64 ms), while a Pallas
    custom call keeps its standalone speed because XLA cannot fuse the remat
    recompute into it. The input grad stays XLA (strong both ways)."""
    return conv3d_pallas(x, w)


def _conv3d_wg_bwd(res, g):
    x, w = res
    dx = jax.linear_transpose(lambda x_: _xla_conv(x_, w), x)(g)[0]
    if supports_conv3d(x.shape, w.shape) and g.dtype == x.dtype:
        dw = conv3d_wgrad_pallas(x, g).astype(w.dtype)
    else:
        dw = jax.linear_transpose(lambda w_: _xla_conv(x, w_), w)(g)[0]
    return dx, dw


conv3d_wg.defvjp(_conv3d_fwd, _conv3d_wg_bwd)


@jax.custom_vjp
def conv3d_dx(x, w):
    """3^3 SAME conv: Pallas forward + Pallas INPUT grad, XLA weight grad.

    The last untested cell of the decoder-conv matrix (PERF.md): dx of a
    stride-1 3^3 SAME conv is itself such a conv (cotangent x flipped
    IO-swapped kernel), so the multi-row fwd kernel computes it at its
    standalone speed — while the in-step XLA dx runs in a remat-fusion
    context at ~13 TF/s (dec0b: 38.8 ms/event incl. fused norm-bwd
    reductions vs 19.2 ms for the same shape through the Pallas fwd
    kernel). Unlike the wgrad experiment, dx consumes only the cotangent
    and weights — not the rematerialized forward input — so hoisting it
    into a custom call does not force an extra rematerialization pass."""
    return conv3d_pallas(x, w)


def _conv3d_dx_bwd(res, g):
    x, w = res
    w_t = jnp.flip(w, (0, 1, 2)).swapaxes(3, 4)
    if supports_conv3d(g.shape, w_t.shape):
        dx = conv3d_pallas(g, w_t.astype(g.dtype)).astype(x.dtype)
    else:
        dx = jax.linear_transpose(lambda x_: _xla_conv(x_, w), x)(g)[0]
    dw = jax.linear_transpose(lambda w_: _xla_conv(x, w_), w)(g)[0]
    return dx, dw


conv3d_dx.defvjp(_conv3d_fwd, _conv3d_dx_bwd)
