"""Pallas TPU kernel: direct 3^3 stride-1 SAME 3D convolution (forward).

Targets the hybrid U-Net decoder's large-volume conv levels, where XLA's
conv lowering reaches only 13-16 TF/s (measured; dec0's Co=48 fills 37% of the
MXU lane dim). The kernel avoids every Mosaic reshape/alignment pitfall learned
on this chip (PERF.md):

* the operand is pre-padded in XLA — one voxel of z/y/x halo plus alignment
  padding — so every DMA origin lands on untiled dims with static full-width
  trailing slices (no divisibility proofs needed);
* per grid step, a (TZ+2, TY+2, W+2->pad, Ci) halo tile is DMAd to VMEM
  (double-buffered across steps);
* compute runs per output row: for each tap, one (W, Ci) x (Ci, Co) dot with a
  statically x-shifted input window — M=W=128 fills the MXU and no 3D->2D
  flattening is ever required. The z/y tap offsets index untiled scratch dims,
  so they loop in a fori (bounded program size); the x shift must stay a
  static sublane offset and is unrolled.

Only the forward pass: wire it via jax.custom_vjp with the standard XLA
convolution gradients. Contractions run in the input dtype with f32
accumulation (bf16 inputs -> bf16 MXU passes; f32 inputs -> Precision.HIGHEST,
exact — same convention as the other kernels here).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TZ = 8     # output z rows per grid step
TY = 4     # output y rows per grid step


def supports_conv3d(x_shape, w_shape):
    """Static dispatch guard: (B, D, H, W, Ci) input, (3, 3, 3, Ci, Co) kernel."""
    if len(x_shape) != 5 or len(w_shape) != 5:
        return False
    B, D, H, W, Ci = x_shape
    if tuple(w_shape[:3]) != (3, 3, 3) or w_shape[3] != Ci:
        return False
    # W is the MXU M dim: want full tiles; D/H must tile the grid.
    return W % 128 == 0 and D % TZ == 0 and H % TY == 0


def _kernel(x_ref, w_ref, out_ref, scratch, sems, *, W, C, Co, nz, ny, n_total,
            precision):
    b = pl.program_id(0)
    zi = pl.program_id(1)
    yi = pl.program_id(2)
    g = (b * nz + zi) * ny + yi

    def dma(g_, slot):
        b_ = g_ // (nz * ny)
        z_ = (g_ // ny) % nz
        y_ = g_ % ny
        return pltpu.make_async_copy(
            x_ref.at[b_, pl.ds(z_ * TZ, TZ + 2), pl.ds(y_ * TY, TY + 2)],
            scratch.at[slot],
            sems.at[slot],
        )

    slot = jax.lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        dma(g, slot).start()

    @pl.when(g + 1 < n_total)
    def _():
        dma(g + 1, 1 - slot).start()

    dma(g, slot).wait()

    # per output row: accumulate the 27 taps. z/y offsets are dynamic indices
    # into untiled dims (fori); the x shift is a static sublane offset (unrolled).
    for z in range(TZ):
        for y in range(TY):

            def tap_zy(k, acc):
                dz = k // 3
                dy = k % 3
                for dx in range(3):
                    row = scratch[slot, z + dz, y + dy, dx:dx + W, :]
                    tap = w_ref[(k * 3 + dx)]
                    acc = acc + jax.lax.dot_general(
                        row, tap, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision)
                return acc

            acc = jax.lax.fori_loop(0, 9, tap_zy,
                                    jnp.zeros((W, Co), jnp.float32))
            out_ref[0, z, y] = acc.astype(out_ref.dtype)


@jax.jit
def conv3d_pallas(x, w):
    """3^3 stride-1 SAME conv, channels-last: (B, D, H, W, Ci) x (3,3,3,Ci,Co)
    -> (B, D, H, W, Co) in x.dtype."""
    B, D, H, W, Ci = x.shape
    Co = w.shape[4]
    assert supports_conv3d(x.shape, w.shape), (x.shape, w.shape)

    # halo + alignment padding in XLA: one voxel of zero halo on each z/y/x
    # side; the W axis padded up to a sublane-tile multiple and the channel
    # (lane) axis up to a 128 multiple — DMA slices must be whole lane tiles.
    # Padded voxels/channels are zero => SAME zero-padding semantics and zero
    # contributions from the padded K rows.
    Wp = -(-(W + 2) // 8) * 8
    Cp = -(-Ci // 128) * 128
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, Wp - W - 1), (0, Cp - Ci)))
    w_flat = jnp.pad(w.astype(x.dtype), ((0, 0),) * 3 + ((0, Cp - Ci), (0, 0)))
    w_flat = w_flat.reshape(27, Cp, Co)
    precision = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)

    nz, ny = D // TZ, H // TY
    out = pl.pallas_call(
        partial(_kernel, W=W, C=Cp, Co=Co, nz=nz, ny=ny,
                n_total=B * nz * ny, precision=precision),
        out_shape=jax.ShapeDtypeStruct((B * nz * ny, TZ, TY, W, Co), x.dtype),
        grid=(B, nz, ny),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),    # padded operand
            pl.BlockSpec(memory_space=pltpu.VMEM),   # (27, Ci, Co) weights
        ],
        out_specs=pl.BlockSpec(
            (1, TZ, TY, W, Co),
            lambda b, zi, yi: ((b * nz + zi) * ny + yi, 0, 0, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, TZ + 2, TY + 2, Wp, Cp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(xp, w_flat)

    # un-tile: (B*nz*ny, TZ, TY, W, Co) -> (B, D, H, W, Co)
    out = out.reshape(B, nz, ny, TZ, TY, W, Co)
    out = jnp.transpose(out, (0, 1, 3, 2, 4, 5, 6))
    return out.reshape(B, D, H, W, Co)
