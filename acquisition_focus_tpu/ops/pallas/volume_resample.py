"""Pallas TPU kernel: forward-only affine trilinear volume resample.

Accelerated path for the *non-differentiated* volume resamples — above all the
per-view prescan resample feeding the localization nets (reference
learnable_transform.py:248-255 runs it under no_grad; our call site wraps it in
``stop_gradient``). The XLA gather formulation moves one 8-corner row per output
point through the gather engine (measured 18M rows/s => 687 ms per microbatch at
the default workload); this kernel reformulates the interpolation as MXU work:

* the (T, Do*Ho*Wo) output points are processed in 8x8x8 tiles;
* per tile, the affine image of the tile is a parallelepiped whose bounding box
  (BZ x BY x BX source voxels for the supported scale range) is DMAd from HBM
  into VMEM (double-buffered across grid steps, channels interleaved along x);
* the z/y interpolation becomes ONE dense one-hot matmul: Ozy[(z,y), p] holds
  wz*wy for the <=4 nonzero (z,y) corner pairs of each point, contracted against
  the flattened bbox (BZ*BY, BX*8);
* the x interpolation + channel de-interleave are a masked (P, BX*8) multiply
  and a tiny tiling-matrix matmul.

Memory-layout constraints (Mosaic): arrays are (8, 128)-tiled even in HBM, so a
DMA slice may start at any offset on untiled leading dims, but must be
8-aligned on the sublane (second-minor) dim and 128-aligned on the lane
(minor) dim. The operand is therefore laid out (B, D, H, W*8) with channels
padded to 8 per x position: z lands on an untiled dim (exact origins), y on
sublanes (origin rounded down to 8), and x*8 on lanes (origin rounded down to
16 x-voxels = 128 lanes).

Precision: weights are computed in f32 and cast to the *input dtype* for the MXU
contraction. For the bf16 prescan path this loses nothing: the reference output
is rounded to bf16 anyway, and bf16 weights perturb the [0, 1] interpolation by
~1 output ulp. For f32 inputs the contraction runs in f32 at Precision.HIGHEST
(slow but exact — used for correctness fallbacks/tests only).

NOT differentiable: no VJP is defined (the call sites are stop-gradient). The
coverage precondition — each 8-cube output tile's source extent plus the
alignment slack must fit the static bbox — bounds the affine scale at roughly
<= 1.45 source voxels per output voxel (z is the binding axis), amply satisfied
by the prescan path (scale <= ~1.25 incl. augmentation);
``supports_affine_volume_resample`` guards the dispatch.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 8            # output tile edge; P = TILE**3 points per grid step
C8 = 8              # channels padded to 8 => 16 x-voxels = 128 lanes
_P = TILE ** 3

# Static source-bbox sizes (BZ, BY, BX): depth is an untiled dim (exact
# origins), height origins round down to 8 sublanes, width to 16 x-voxels
# (= 128 lanes). Both the one-hot contraction FLOPs and the per-tile DMA
# traffic scale with BZ*BY*BX, so a tighter bbox is strictly faster — the
# runtime guard (kernel_scale_fits) dispatches the SMALL variant whenever the
# actual affines fit it (the prescan path: near-unit scale + small learned /
# augmentation rotations), falling back to LARGE (scale <= ~1.45) and then to
# the exact XLA gather.
BBOX_LARGE = (20, 32, 48)
BBOX_SMALL = (14, 24, 32)   # fits tile extents <= (11, 14, 14): scale ~1.25
                            # with rotations up to ~30 deg on the 8-cube tile


def supports_affine_volume_resample(in_dhw, out_dhw, C, bbox=BBOX_LARGE):
    """Static dispatch guard for :func:`affine_volume_resample_pallas`."""
    bz, by, bx = bbox
    D, H, W = in_dhw
    ok_in = D >= bz and H >= by and W >= bx
    ok_out = all(s % TILE == 0 and s > 0 for s in out_dhw)
    return ok_in and ok_out and C <= C8


def kernel_scale_fits(theta, out_dhw, in_dhw, bbox=BBOX_LARGE):
    """Traced runtime guard: does every affine's 8-cube tile image fit the static
    bbox, including floor/corner (+2) and DMA alignment slack (y origins round
    down to 8 voxels: +7; x to 16: +15)?

    The per-source-axis extent of a tile is (TILE-1) * (|cd_r|+|ch_r|+|cw_r|)
    from the affine coefficients — the exact quantity the kernel's corner_min
    DMA-origin math sees, so this is tight where the static config heuristic
    (engine.train.prescan_kernel_in_scale) is only a worst-case bound.
    Returns a scalar bool for use with ``lax.cond``.
    """
    bz, by, bx = bbox
    coefs = _coeffs_from_theta(theta, out_dhw, in_dhw)        # rows: x, y, z
    ext = (TILE - 1) * jnp.abs(coefs[:, :, 1:]).sum(-1)       # (T, 3)
    return jnp.all((ext[:, 2] <= bz - 3) & (ext[:, 1] <= by - 10)
                   & (ext[:, 0] <= bx - 18))


def _coeffs_from_theta(theta, out_dhw, in_dhw):
    """(T, 3, 4) f32 affine coefficients mapping output voxel (d, h, w) to
    continuous source voxel coords (ix, iy, iz):
      i_r(d, h, w) = c0_r + cd_r*d + ch_r*h + cw_r*w
    following torch align_corners=False conventions (ops.resample._sample_points:
    theta row 0 -> x indexes W, row 1 -> y/H, row 2 -> z/D; gx moves with w)."""
    do, ho, wo = (float(s) for s in out_dhw)
    D, H, W = in_dhw
    a = theta[:, :3, :4].astype(jnp.float32)
    n = jnp.asarray([W, H, D], jnp.float32)[None, :]        # per-row source size
    s0 = (a[..., 0] * (1.0 / wo - 1.0) + a[..., 1] * (1.0 / ho - 1.0)
          + a[..., 2] * (1.0 / do - 1.0) + a[..., 3])
    c0 = ((s0 + 1.0) * n - 1.0) / 2.0
    cd = a[..., 2] * (n / do)
    ch = a[..., 1] * (n / ho)
    cw = a[..., 0] * (n / wo)
    return jnp.stack([c0, cd, ch, cw], axis=-1)


def _kernel(coef_ref, vol_ref, out_ref, scratch, sems, *,
            B, C, in_dhw, tiles_per_axis, n_total, compute_dtype, bbox):
    BZ, BY, BX = bbox
    D, H, W = in_dhw
    BXC = BX * C8
    ni, nj, nk = tiles_per_axis
    n_tiles = ni * nj * nk
    t = pl.program_id(0)
    i = pl.program_id(1)
    g = t * n_tiles + i

    def corner_min(r, t_, ti, tj, tk):
        """floor(min over the tile's corners of source coord r) as int32."""
        c0 = coef_ref[t_, r, 0]
        cd = coef_ref[t_, r, 1]
        ch = coef_ref[t_, r, 2]
        cw = coef_ref[t_, r, 3]
        d0 = (ti * TILE).astype(jnp.float32)
        h0 = (tj * TILE).astype(jnp.float32)
        w0 = (tk * TILE).astype(jnp.float32)
        span = float(TILE - 1)
        v = (c0 + jnp.minimum(cd * d0, cd * (d0 + span))
             + jnp.minimum(ch * h0, ch * (h0 + span))
             + jnp.minimum(cw * w0, cw * (w0 + span)))
        return jnp.floor(v).astype(jnp.int32)

    def origin(g_):
        t_ = g_ // n_tiles
        i_ = g_ % n_tiles
        ti = i_ // (nj * nk)
        tj = (i_ // nk) % nj
        tk = i_ % nk
        z0 = jnp.clip(corner_min(2, t_, ti, tj, tk), 0, D - BZ)
        # sublane/lane DMA alignment: y to 8 voxels, x to 16 (= 128 lanes).
        # Expressed as block_index * block so Mosaic can PROVE divisibility
        # (a masked `& ~7` clip is not recognized by its tiling analysis).
        # H, W are padded to multiples of 8/16 by the wrapper, so the clip
        # bounds keep the alignment.
        yb = jnp.clip(corner_min(1, t_, ti, tj, tk) >> 3, 0, (H - BY) // 8)
        xb = jnp.clip(corner_min(0, t_, ti, tj, tk) >> 4, 0, (W - BX) // 16)
        return t_, z0, yb * 8, xb * 16

    def dma(g_, slot):
        t_, z0, y0, x0 = origin(g_)
        b = t_ % B
        return pltpu.make_async_copy(
            vol_ref.at[b, pl.ds(z0, BZ), pl.ds(y0, BY), pl.ds(x0 * C8, BXC)],
            scratch.at[slot],
            sems.at[slot],
        )

    # cross-invocation double buffering: invocation g waits on the DMA issued at
    # g-1 (or self-issued at g==0) and prefetches tile g+1
    slot = jax.lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        dma(g, slot).start()

    @pl.when(g + 1 < n_total)
    def _():
        dma(g + 1, 1 - slot).start()

    dma(g, slot).wait()

    # this tile's origin and point coordinates
    _, z0, y0, x0 = origin(g)
    ti = i // (nj * nk)
    tj = (i // nk) % nj
    tk = i % nk

    def coords(shape, dim):
        q = jax.lax.broadcasted_iota(jnp.int32, shape, dim)
        d = (ti * TILE + q // (TILE * TILE)).astype(jnp.float32)
        h = (tj * TILE + (q // TILE) % TILE).astype(jnp.float32)
        w = (tk * TILE + q % TILE).astype(jnp.float32)

        def row(r):
            return (coef_ref[t, r, 0] + coef_ref[t, r, 1] * d
                    + coef_ref[t, r, 2] * h + coef_ref[t, r, 3] * w)

        return row(0), row(1), row(2)

    ix_r, iy_r, iz_r = coords((1, _P), 1)       # (1, P) rows
    ix_c, _, _ = coords((_P, 1), 0)             # (P, 1) col (x only)

    # flatten the bbox: (BZ, BY, BXC) -> (BZ*BY, BXC) via per-z-slab copies
    # (Mosaic has no 3D vector reshape; BY=32 rows keep every store tile-aligned)
    def flatten(scr2):
        for z in range(BZ):
            scr2[z * BY:(z + 1) * BY, :] = scratch[slot, z]

        # z/y interpolation as ONE one-hot matmul. Weight rows are built by
        # comparing each bbox row's global (z, y) against the points' corner
        # indices; out-of-volume corners never match an in-bbox row => zero
        # padding for free (bbox origins are clamped into the volume).
        zrow = z0 + jax.lax.broadcasted_iota(jnp.int32, (BZ * BY, 1), 0) // BY
        yrow = y0 + jax.lax.broadcasted_iota(jnp.int32, (BZ * BY, 1), 0) % BY

        # epsilon-nudged cell assignment, matching ops.resample.grid_sample's
        # convention (boundary samples i == k - eps land in cell k)
        eps = 2.0 ** -14
        zf = jnp.floor(iz_r + eps)
        fz = jnp.maximum(iz_r - zf, 0.0)
        z0p = zf.astype(jnp.int32)              # (1, P)
        yf = jnp.floor(iy_r + eps)
        fy = jnp.maximum(iy_r - yf, 0.0)
        y0p = yf.astype(jnp.int32)

        wz = (jnp.where(zrow == z0p, 1.0 - fz, 0.0)
              + jnp.where(zrow == z0p + 1, fz, 0.0))
        wy = (jnp.where(yrow == y0p, 1.0 - fy, 0.0)
              + jnp.where(yrow == y0p + 1, fy, 0.0))
        ozy = (wz * wy).astype(compute_dtype)   # (BZ*BY, P)

        prec = (jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        s2 = jax.lax.dot_general(                # (P, BXC) f32
            ozy, scr2[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

        # x interpolation + channel de-interleave (C8 = 8 => shifts, not divs)
        xloc = x0 + jax.lax.broadcasted_iota(jnp.int32, (1, BXC), 1) // C8
        xf = jnp.floor(ix_c + eps)
        fx = jnp.maximum(ix_c - xf, 0.0).astype(jnp.float32)
        x0p = xf.astype(jnp.int32)               # (P, 1)
        ox = (jnp.where(xloc == x0p, 1.0 - fx, 0.0)
              + jnp.where(xloc == x0p + 1, fx, 0.0))   # (P, BXC)

        mc = (jax.lax.broadcasted_iota(jnp.int32, (BXC, C), 0) % C8
              == jax.lax.broadcasted_iota(jnp.int32, (BXC, C), 1))
        out = jax.lax.dot_general(               # (C, P)
            mc.astype(jnp.float32), s2 * ox, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        out_ref[0] = out.astype(out_ref.dtype)

    pl.run_scoped(flatten, pltpu.VMEM((BZ * BY, BX * C8), compute_dtype))


def _untile(flat, T, C, out_dhw, tiles_per_axis):
    ni, nj, nk = tiles_per_axis
    x = flat.reshape(T, C, ni, nj, nk, TILE, TILE, TILE)
    x = jnp.transpose(x, (0, 1, 2, 5, 3, 6, 4, 7))
    return x.reshape((T, C) + tuple(out_dhw))


@partial(jax.jit, static_argnames=('out_dhw', 'bbox'))
def affine_volume_resample_pallas(volume, theta, out_dhw, bbox=BBOX_LARGE):
    """Forward-only trilinear ``grid_sample`` (torch align_corners=False, zero
    padding) on TPU via per-tile bbox DMA + MXU one-hot contraction.

    Args:
      volume: (B, C, D, H, W), float dtype (bf16 recommended — see module doc).
      theta: (T, 4, 4) or (T, 3, 4) grid-space affines, T a multiple of B;
        affine row t samples volume t % B.
      out_dhw: static (Do, Ho, Wo), each a multiple of 8.
      bbox: static (BZ, BY, BX) source bbox; every affine must satisfy
        ``kernel_scale_fits(theta, out_dhw, in_dhw, bbox)`` or out-of-bbox
        corners are silently clamped. BBOX_SMALL is ~2.9x cheaper in both
        MXU work and DMA traffic than BBOX_LARGE.

    Returns: (T, C, Do, Ho, Wo) in ``volume.dtype``. Matches
    ``ops.resample.grid_sample(..., mode='trilinear')`` up to the weight-dtype
    rounding described in the module docstring.
    """
    B, C, D, H, W = volume.shape
    T = theta.shape[0]
    assert T % B == 0
    assert supports_affine_volume_resample((D, H, W), out_dhw, C, bbox), (
        f"unsupported shapes for the Pallas volume resampler: "
        f"in={(D, H, W)} out={out_dhw} C={C} bbox={bbox}")
    tiles_per_axis = tuple(s // TILE for s in out_dhw)
    n_tiles = tiles_per_axis[0] * tiles_per_axis[1] * tiles_per_axis[2]

    compute_dtype = jnp.float32 if volume.dtype == jnp.float32 else jnp.bfloat16
    coefs = _coeffs_from_theta(theta, out_dhw, (D, H, W))
    # channels-interleaved (B, D, H, W*8) operand; H to a multiple of 8 and W to
    # a multiple of 16 so clamped, aligned bbox origins stay in range (padding
    # voxels are never selected: weights compare against true source indices)
    Hp = -(-H // 8) * 8
    Wp = -(-W // 16) * 16
    vol2 = jnp.transpose(volume, (0, 2, 3, 4, 1)).astype(compute_dtype)
    vol2 = jnp.pad(vol2, ((0, 0), (0, 0), (0, Hp - H), (0, Wp - W),
                          (0, C8 - C)))
    vol2 = vol2.reshape(B, D, Hp, Wp * C8)

    out = pl.pallas_call(
        partial(_kernel, B=B, C=C, in_dhw=(D, Hp, Wp),
                tiles_per_axis=tiles_per_axis,
                n_total=T * n_tiles, compute_dtype=compute_dtype, bbox=bbox),
        out_shape=jax.ShapeDtypeStruct((T, C, n_tiles * _P), volume.dtype),
        grid=(T, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # coefs (T, 3, 4), whole
            pl.BlockSpec(memory_space=pltpu.HBM),    # operand stays in HBM
        ],
        out_specs=pl.BlockSpec((1, C, _P), lambda t, i: (t, 0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, bbox[0], bbox[1], bbox[2] * C8), compute_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(coefs, vol2)

    return _untile(out, T, C, out_dhw, tiles_per_axis)
