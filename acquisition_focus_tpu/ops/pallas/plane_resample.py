"""Pallas TPU kernel: re-embed a 2D plane into a 3D volume along an affine.

Drop-in accelerated path for ``ops.resample.sample_slice_into_volume`` — the skip
connector's hot op (6 levels x n_views x batch full-volume resamples per training
step, reference hybrid_unet.py:71-94). The XLA gather formulation moves one point at
a time; this kernel reformulates the bilinear interpolation as MXU work:

  stage 1:  R = Oz^T @ slice_rows   — Oz (S, P) carries the two-nonzero
            z-interpolation weights (and the plane weight): blended slice rows;
  stage 2:  out^T += M_c^T @ (Oy ⊙ R) per y-chunk — the y-interpolation as an
            elementwise mask against the y-expanded grid followed by a
            channel-tiling matmul (Mosaic supports no 3D vector reshapes, so the
            (P, S, C) tensor stays flat and is contracted with iota-built tiling
            matrices, chunked over y to bound VMEM).

Output points are processed in *3D-local tiles* (e.g. 16x16x8): the re-embedded
plane intersects only ~tile_diag/S of the cubic tiles, so ~85-90% of tiles hit the
all-zero plane-weight predicate and skip all compute. (Flat point blocks cannot skip:
every w-row crosses the plane somewhere.) The tile-major output is un-tiled by a
cheap XLA transpose.

In-kernel matmuls default to Precision.HIGHEST — uncontrolled bf16 MXU passes round
the interpolation weights and cost ~1e-2 absolute error (measured). ``fast=True``
(used when the consuming model computes in bf16) switches them to bf16 operands
with f32 accumulation: ~2e-3 relative gradient error, bwd ~1.5x faster.

The custom VJP recomputes the cheap coordinate math in a second kernel and yields
gradients for both the slice values (transposed matmuls, accumulated across tiles)
and the affine (per-tile (3, 4) reductions chained through the coefficient map),
matching jax.grad of the XLA formulation to float32 round-off.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _coeffs_from_theta(theta, out_spat, S):
    """Per-batch affine coefficients mapping output (d, h, w) -> continuous slice
    coords. Derivation: output normalized coords g = ((2i+1)/So - 1) per axis;
    s = theta[:3] @ (gx, gy, gz, 1); i = ((s+1)*S-1)/2 — affine in (d, h, w):
      i(d, h, w) = c0 + cd*d + ch*h + cw*w.
    Returns (B, 3, 4) float32: rows (ix, iy, iz), cols (c0, cd, ch, cw).
    """
    a = theta[:, :3, :].astype(jnp.float32)
    so = float(out_spat)
    base = 1.0 / so - 1.0
    step = 2.0 / so
    s0 = a[..., 0] * base + a[..., 1] * base + a[..., 2] * base + a[..., 3]
    sd = a[..., 2] * step   # d moves gz
    sh = a[..., 1] * step   # h moves gy
    sw = a[..., 0] * step   # w moves gx
    c0 = ((s0 + 1.0) * S - 1.0) / 2.0
    return jnp.stack([c0, sd * S / 2.0, sh * S / 2.0, sw * S / 2.0], axis=-1)


def _tile_dims(S, bwd=False):
    """3D tile (td, th, tw); P = td*th*tw points per kernel invocation.

    Backward stays at cubic 8^3: (16,8,8) was tried and REGRESSED the train
    step 2.81 -> 3.01 s — elongated tiles intersect the re-embedded plane more
    often, and the lost slab skipping outweighs the halved per-invocation
    overhead. AF_PLANE_BWD_TILE=td,th,tw overrides at trace time for
    experiments (see PERF.md for per-shape step-time measurements)."""
    if bwd:
        import os
        override = os.environ.get('AF_PLANE_BWD_TILE')
        if override:
            parts = override.split(',')
            if len(parts) != 3 or not all(p.strip().lstrip('-').isdigit()
                                          for p in parts):
                raise ValueError(
                    f"AF_PLANE_BWD_TILE={override!r}: expected three "
                    "comma-separated positive ints 'td,th,tw'")
            dims = tuple(min(int(p), S) for p in parts)
            if any(t <= 0 or S % t for t in dims):
                raise ValueError(
                    f"AF_PLANE_BWD_TILE={override!r}: each tile dim (after "
                    f"clamping to S={S}) must be positive and divide S; "
                    f"got {dims}")
            return dims
        return min(8, S), min(8, S), min(8, S)
    return min(16, S), min(16, S), min(8, S)


def _y_chunk_size(S, C):
    """y positions per stage-2 chunk: bound the (P, YC*C) buffers to ~2MB.

    On TPU the dynamic lane-dim slice offset yc*YC*C must be provably a
    multiple of 128, so YC*C must be too — true for the skip connector's
    power-of-two channel widths (16..256); other widths only run in interpret
    mode / tests."""
    return max(1, min(16, S, 256 // C))


def plane_resample_supported(S, C):
    """Whether the Pallas kernel's lane-slice constraint holds for this shape.

    The stage-2 chunk loop slices the (S, S*C) slab at dynamic lane offsets
    yc*YC*C, which Mosaic requires to be provably 128-multiples. True for all
    reference width plans (f in 16..256 at S in 4..128); tiny debug widths
    (e.g. f=8 at S=8) violate it and must use the XLA gather fallback."""
    return (_y_chunk_size(S, C) * C) % 128 == 0


def _tile_point_coords(coef_ref, tile, dims, tiles_per_axis, shape, dim):
    """Continuous (ix, iy, iz) and (d, h, w) for this tile's points, oriented as
    `shape` ((1, P) for dim=1 / (P, 1) for dim=0)."""
    td, th, tw = dims
    _, nj, nk = tiles_per_axis
    P = td * th * tw
    ti = tile // (nj * nk)
    tj = (tile // nk) % nj
    tk = tile % nk

    q = jax.lax.broadcasted_iota(jnp.int32, shape, dim)
    d = (ti * td + q // (th * tw)).astype(jnp.float32)
    h = (tj * th + (q // tw) % th).astype(jnp.float32)
    w = (tk * tw + q % tw).astype(jnp.float32)

    def row(r):
        return (coef_ref[0, r, 0] + coef_ref[0, r, 1] * d
                + coef_ref[0, r, 2] * h + coef_ref[0, r, 3] * w)

    return row(0), row(1), row(2), d, h, w


def _oz_matrix(iz_row, S, P, with_derivative=False):
    """(S, P) z-interpolation matrix (2 nonzeros per column, zero padding).

    Cell assignment uses the epsilon-nudged floor convention of
    ops.resample.grid_sample (boundary samples i == k - eps land in cell k)."""
    z0 = jnp.floor(iz_row + 2.0 ** -14)
    fz = jnp.maximum(iz_row - z0, 0.0)
    z0i = z0.astype(jnp.int32)
    zcol = jax.lax.broadcasted_iota(jnp.int32, (S, P), 0)
    m0 = (zcol == z0i) & (z0i >= 0)
    m1 = (zcol == z0i + 1) & (z0i + 1 <= S - 1)
    oz = jnp.where(m0, 1.0 - fz, 0.0) + jnp.where(m1, fz, 0.0)
    if with_derivative:
        oz_d = jnp.where(m1, 1.0, 0.0) - jnp.where(m0, 1.0, 0.0)
        return oz, oz_d
    return oz


def _oy_chunk(iy_col, y_base, YC, S, C, P, with_derivative=False):
    """(P, YC*C) y-interpolation mask for y positions [y_base, y_base+YC)."""
    y0 = jnp.floor(iy_col + 2.0 ** -14)     # eps-nudged, see _oz_matrix
    fy = jnp.maximum(iy_col - y0, 0.0)
    y0i = y0.astype(jnp.int32)
    ygrid = jax.lax.broadcasted_iota(jnp.int32, (P, YC * C), 1) // C + y_base
    m0 = (ygrid == y0i) & (y0i >= 0)
    m1 = (ygrid == y0i + 1) & (y0i + 1 <= S - 1)
    oy = jnp.where(m0, 1.0 - fy, 0.0) + jnp.where(m1, fy, 0.0)
    if with_derivative:
        oy_d = jnp.where(m1, 1.0, 0.0) - jnp.where(m0, 1.0, 0.0)
        return oy, oy_d
    return oy


def _chunk_band(iy_row, plane_w, S, YC):
    """Inclusive [c_lo, c_hi] stage-2 chunk range actually touched by the
    plane-active points of this tile.

    A point with plane weight zero contributes nothing in either kernel (its
    oz column / pw_col factor is zero), so only active points' y cells matter:
    y in [floor(min_iy + eps), floor(max_iy + eps) + 1] (the eps-nudged floor
    convention of _oy_chunk). Out-of-range cells are masked to zero by
    _oy_chunk anyway, so clamping into [0, S-1] is exact. Called only under
    ``max(plane_w) > 0`` — at least one point is active. For the skip
    connector's affines the band spans a few chunks out of S // YC (up to 128
    at C=256): this bound is where the kernel's slab skipping extends from
    whole tiles into the y loop."""
    big = jnp.float32(3.4e38)
    iy_min = jnp.min(jnp.where(plane_w > 0.0, iy_row, big))
    iy_max = jnp.max(jnp.where(plane_w > 0.0, iy_row, -big))
    y_lo = jnp.clip(jnp.floor(iy_min + 2.0 ** -14).astype(jnp.int32), 0, S - 1)
    y_hi = jnp.clip(jnp.floor(iy_max + 2.0 ** -14).astype(jnp.int32) + 1,
                    0, S - 1)
    return y_lo // YC, y_hi // YC


def _channel_tile_matrix(YC, C):
    """(YC*C, C): M[m, c] = 1 iff m % C == c."""
    m = jax.lax.broadcasted_iota(jnp.int32, (YC * C, C), 0) % C
    c = jax.lax.broadcasted_iota(jnp.int32, (YC * C, C), 1)
    return (m == c).astype(jnp.float32)


def _y_tile_matrix(YC, C):
    """(YC*C, YC): M[m, y] = 1 iff m // C == y."""
    m = jax.lax.broadcasted_iota(jnp.int32, (YC * C, YC), 0) // C
    y = jax.lax.broadcasted_iota(jnp.int32, (YC * C, YC), 1)
    return (m == y).astype(jnp.float32)


def _dot(a, b, contract, fast=False):
    # Default: full f32 MXU passes — the interpolation weights must not round
    # to bf16 (default precision costs ~1e-2 absolute error — measured).
    # fast=True: bf16 operands with f32 accumulation, for models whose
    # activations/gradients are bf16-rounded anyway (~2e-3 relative gradient
    # error measured; bwd 100.8 -> 69.1 ms on the level-0 connector).
    if fast:
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            (contract, ((), ())), preferred_element_type=jnp.float32)
    return jax.lax.dot_general(a, b, (contract, ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _row_to_col(v_row):
    """(1, P) -> (P, 1) without vector transpose support."""
    return _dot(v_row, jnp.ones((1, 1), jnp.float32), ((0,), (1,)))


def _fwd_kernel(coef_ref, slice_ref, out_ref, *, S, dims, tiles_per_axis, C,
                fast):
    tile = pl.program_id(1)
    P = dims[0] * dims[1] * dims[2]
    ix_r, iy_r, iz_r, _, _, _ = _tile_point_coords(
        coef_ref, tile, dims, tiles_per_axis, (1, P), 1)
    _, iy_c, _, _, _, _ = _tile_point_coords(
        coef_ref, tile, dims, tiles_per_axis, (P, 1), 0)

    mid = float(S // 2)
    plane_w = jnp.maximum(0.0, 1.0 - jnp.abs(ix_r - mid))  # (1, P)

    @pl.when(jnp.max(plane_w) <= 0.0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    @pl.when(jnp.max(plane_w) > 0.0)
    def _():
        oz = _oz_matrix(iz_r, S, P) * plane_w          # (S, P), plane weight folded
        YC = _y_chunk_size(S, C)
        m_c = _channel_tile_matrix(YC, C)              # (YC*C, C)

        def chunk(yc, acc):
            slab_c = slice_ref[0, :, pl.ds(yc * YC * C, YC * C)]  # (S, YC*C)
            r_c = _dot(oz, slab_c, ((0,), (0,)), fast)   # (P, YC*C)
            oy_c = _oy_chunk(iy_c, yc * YC, YC, S, C, P)
            return acc + _dot(m_c, r_c * oy_c, ((0,), (1,)), fast)  # (C, P)

        c_lo, c_hi = _chunk_band(iy_r, plane_w, S, YC)
        out_ref[0] = jax.lax.fori_loop(
            c_lo, c_hi + 1, chunk,
            jnp.zeros((C, P), jnp.float32)).astype(out_ref.dtype)


def _bwd_kernel(coef_ref, slice_ref, g_ref, dslice_ref, dcoef_ref,
                *, S, dims, tiles_per_axis, C, fast):
    tile = pl.program_id(1)
    P = dims[0] * dims[1] * dims[2]

    @pl.when(tile == 0)
    def _():
        dslice_ref[...] = jnp.zeros(dslice_ref.shape, dslice_ref.dtype)
        dcoef_ref[...] = jnp.zeros(dcoef_ref.shape, dcoef_ref.dtype)

    ix_r, iy_r, iz_r, _, _, _ = _tile_point_coords(
        coef_ref, tile, dims, tiles_per_axis, (1, P), 1)
    _, iy_c, _, d_c, h_c, w_c = _tile_point_coords(
        coef_ref, tile, dims, tiles_per_axis, (P, 1), 0)

    mid = float(S // 2)
    delta = ix_r - mid
    plane_w = jnp.maximum(0.0, 1.0 - jnp.abs(delta))   # (1, P)

    @pl.when(jnp.max(plane_w) > 0.0)
    def _():
        oz, oz_d = _oz_matrix(iz_r, S, P, with_derivative=True)
        YC = _y_chunk_size(S, C)
        m_c = _channel_tile_matrix(YC, C)
        m_y = _y_tile_matrix(YC, C)
        g = g_ref[0]                                   # (C, P)
        g_exp = _dot(g, m_c, ((0,), (1,)), fast)       # (P, YC*C), reused per chunk
        pw_col = _row_to_col(plane_w)                  # (P, 1)

        def chunk(yc, carry):
            out_raw, diy_raw, diz_raw = carry
            slab_c = slice_ref[0, :, pl.ds(yc * YC * C, YC * C)]
            oy_c, oyd_c = _oy_chunk(iy_c, yc * YC, YC, S, C, P,
                                    with_derivative=True)

            r_raw = _dot(oz, slab_c, ((0,), (0,)), fast)   # (P, YC*C)
            t = r_raw * g_exp
            gy_c = _dot(t, m_y, ((1,), (0,)), fast)    # (P, YC)
            oyy_c = _dot(oy_c, m_y, ((1,), (0,)), fast) * (1.0 / C)
            oydy_c = _dot(oyd_c, m_y, ((1,), (0,)), fast) * (1.0 / C)

            out_raw = out_raw + (gy_c * oyy_c).sum(axis=1, keepdims=True)
            diy_raw = diy_raw + (gy_c * oydy_c).sum(axis=1, keepdims=True)

            r_d = _dot(oz_d, slab_c, ((0,), (0,)), fast)
            gz_c = _dot(r_d * g_exp, m_y, ((1,), (0,)), fast)
            diz_raw = diz_raw + (gz_c * oyy_c).sum(axis=1, keepdims=True)

            dR_c = pw_col * oy_c * g_exp               # (P, YC*C)
            dslice_ref[0, :, pl.ds(yc * YC * C, YC * C)] += _dot(
                oz, dR_c, ((1,), (0,)), fast)          # (S, YC*C)
            return out_raw, diy_raw, diz_raw

        zeros3 = (jnp.zeros((P, 1), jnp.float32),) * 3
        c_lo, c_hi = _chunk_band(iy_r, plane_w, S, YC)
        out_raw, diy_raw, diz_raw = jax.lax.fori_loop(
            c_lo, c_hi + 1, chunk, zeros3)

        dpw_col = _row_to_col(
            jnp.where(jnp.abs(delta) < 1.0, -jnp.sign(delta), 0.0))
        d_ix = dpw_col * out_raw
        d_iy = pw_col * diy_raw
        d_iz = pw_col * diz_raw

        basis = jnp.concatenate(
            [jnp.ones_like(d_c), d_c, h_c, w_c], axis=1)      # (P, 4)
        di = jnp.concatenate([d_ix, d_iy, d_iz], axis=1)      # (P, 3)
        dcoef_ref[0] += _dot(di, basis, ((0,), (0,)))         # (3, 4)


def _tile_layout(out_spat, bwd=False):
    dims = _tile_dims(out_spat, bwd)
    tiles_per_axis = tuple(out_spat // t for t in dims)
    n_tiles = tiles_per_axis[0] * tiles_per_axis[1] * tiles_per_axis[2]
    return dims, tiles_per_axis, n_tiles


def _untile(flat, B, C, out_spat, dims, tiles_per_axis):
    td, th, tw = dims
    ni, nj, nk = tiles_per_axis
    x = flat.reshape(B, C, ni, nj, nk, td, th, tw)
    x = jnp.transpose(x, (0, 1, 2, 5, 3, 6, 4, 7))
    return x.reshape(B, C, out_spat, out_spat, out_spat)


def _tile(vol, B, C, out_spat, dims, tiles_per_axis):
    td, th, tw = dims
    ni, nj, nk = tiles_per_axis
    x = vol.reshape(B, C, ni, td, nj, th, nk, tw)
    x = jnp.transpose(x, (0, 1, 2, 4, 6, 3, 5, 7))
    return x.reshape(B, C, out_spat ** 3)


def _forward_impl(slices, theta, out_spat, fast):
    B, C, S, S2 = slices.shape
    assert S == S2
    dims, tiles_per_axis, n_tiles = _tile_layout(out_spat)
    P = dims[0] * dims[1] * dims[2]

    coefs = _coeffs_from_theta(theta, out_spat, S)  # (B, 3, 4)
    # slice rows with channels interleaved: row z holds [y0 chans..., y1 chans...]
    slice_rows = jnp.transpose(slices, (0, 2, 3, 1)).reshape(B, S, S * C)
    slice_rows = slice_rows.astype(jnp.float32)

    # fast path: emit the consumer's dtype straight from the kernel so the
    # un-tiling transpose moves bf16, not f32 — bit-identical to transposing
    # f32 then casting (the transpose is value-preserving), half the HBM
    # traffic on the hot level-0 copies.
    out_dtype = slices.dtype if fast else jnp.float32
    out = pl.pallas_call(
        partial(_fwd_kernel, S=S, dims=dims, tiles_per_axis=tiles_per_axis,
                C=C, fast=fast),
        out_shape=jax.ShapeDtypeStruct((B, C, out_spat ** 3), out_dtype),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 3, 4), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, S, S * C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, P), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
    )(coefs, slice_rows)

    out = _untile(out, B, C, out_spat, dims, tiles_per_axis)
    return out.astype(slices.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def plane_resample_pallas(slices, theta, out_spat, fast=False):
    """Pallas-accelerated sample_slice_into_volume: (B, C, S, S), (B, 4, 4) ->
    (B, C, out_spat, out_spat, out_spat). Differentiable w.r.t. both arguments.

    fast=True runs the MXU contractions in bf16 (f32 accumulation) — for
    models whose surrounding activations/gradients are bf16 anyway (the
    hybrid U-Net's compute_dtype='bfloat16' path); ~2e-3 relative gradient
    error vs the exact f32 path, measured."""
    return _forward_impl(slices, theta, out_spat, fast)


def _fwd_rule(slices, theta, out_spat, fast):
    return _forward_impl(slices, theta, out_spat, fast), (slices, theta)


def _bwd_rule(out_spat, fast, residuals, g):
    slices, theta = residuals
    B, C, S, _ = slices.shape
    dims, tiles_per_axis, n_tiles = _tile_layout(out_spat, bwd=True)
    P = dims[0] * dims[1] * dims[2]

    coefs = _coeffs_from_theta(theta, out_spat, S)
    slice_rows = jnp.transpose(slices, (0, 2, 3, 1)).reshape(B, S, S * C)
    slice_rows = slice_rows.astype(jnp.float32)
    # fast path: keep the cotangent in its native (bf16) dtype through the
    # tiling transpose and the kernel DMA — _dot casts operands to bf16
    # in-kernel anyway, so the values are identical and the traffic halves.
    g_flat = _tile(g if fast else g.astype(jnp.float32),
                   B, C, out_spat, dims, tiles_per_axis)

    dslice_rows, dcoefs = pl.pallas_call(
        partial(_bwd_kernel, S=S, dims=dims, tiles_per_axis=tiles_per_axis,
                C=C, fast=fast),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, S * C), jnp.float32),
            jax.ShapeDtypeStruct((B, 3, 4), jnp.float32),
        ),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 3, 4), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, S, S * C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, P), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, S, S * C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 4), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )(coefs, slice_rows, g_flat)

    d_slices = jnp.transpose(
        dslice_rows.reshape(B, S, S, C), (0, 3, 1, 2)).astype(slices.dtype)

    # chain d_coef -> d_theta through the (cheap, jnp) coefficient map
    _, coef_vjp = jax.vjp(lambda th: _coeffs_from_theta(th, out_spat, S), theta)
    d_theta = coef_vjp(dcoefs)[0].astype(theta.dtype)
    return d_slices, d_theta


plane_resample_pallas.defvjp(_fwd_rule, _bwd_rule)
