"""Geometry-preserving volume resampling — the framework's hot op.

Everything here is pure jnp with static shapes, differentiable w.r.t. both the sampled
values and the sampling affine (gradients flow through the interpolation weights), and
designed for XLA on TPU: coordinates are computed as fused broadcasted arithmetic and
values are fetched with flat batched gathers (no scatter into zero volumes, no
data-dependent shapes).

TPU layout note: gathers whose output minor dimension is the channel count get padded
to the 128-lane tile by XLA (observed 8-64x HBM padding blow-ups -> OOM at 128^3).
All gathers here therefore run in (C, B*N) space — batch folded into the gathered
point axis, channels on sublanes — with 1-D weight/mask vectors; padding waste is
zero for any channel count.

Semantics match ``torch.nn.functional.affine_grid`` + ``grid_sample`` with
``align_corners=False`` and zero padding (the reference's convention,
/root/reference/acquisition_focus/utils/nifti_utils.py:112-207):

* An output voxel (d, h, w) of an (Do, Ho, Wo) target has normalized coordinates
  g = ((2w+1)/Wo - 1, (2h+1)/Ho - 1, (2d+1)/Do - 1, 1) — note the reversed axis
  order: the coordinate vector is (x->W, y->H, z->D).
* The sampling point is s = theta[:3, :] @ g, mapped to input voxel coordinates by
  i = ((s + 1) * N - 1) / 2 per axis.
* ``trilinear`` interpolates the 8 surrounding voxels, treating out-of-bounds
  neighbors as zero; ``nearest`` takes the round-half-to-even neighbor, zero if
  out of bounds.

The slice->volume re-embedding used by the reconstruction model's skip connections is
implemented as :func:`sample_slice_into_volume`: instead of materializing a zero volume
with one written plane and trilinearly resampling it (reference hybrid_unet.py:71-94),
we exploit that only one plane is non-zero, which collapses the trilinear sample to a
2D bilinear gather times a triangular plane weight — 2x fewer gathers, 8x less
memory traffic, and no (B, C, S, S, S) intermediate.
"""

from functools import partial

import jax
import jax.numpy as jnp

from acquisition_focus_tpu.ops.affine import grid_affines_for_fov, vox_to_grid_offset


def _normalized_coords(n, dtype):
    """Centers of n cells in [-1, 1] under align_corners=False."""
    return (2.0 * jnp.arange(n, dtype=dtype) + 1.0) / n - 1.0


def _sample_points(theta, out_dhw, dtype):
    """Map the output grid through theta.

    Returns (sx, sy, sz), each (B, Do, Ho, Wo), in normalized input space where
    sx indexes the W axis, sy the H axis, sz the D axis.
    """
    do, ho, wo = out_dhw
    gx = _normalized_coords(wo, dtype)[None, None, None, :]
    gy = _normalized_coords(ho, dtype)[None, None, :, None]
    gz = _normalized_coords(do, dtype)[None, :, None, None]
    a = theta.astype(dtype)

    def row(i):
        return (a[:, i, 0, None, None, None] * gx
                + a[:, i, 1, None, None, None] * gy
                + a[:, i, 2, None, None, None] * gz
                + a[:, i, 3, None, None, None])

    return row(0), row(1), row(2)


def _to_vox(s, n):
    """Normalized [-1, 1] coordinate -> continuous voxel index (align_corners=False)."""
    return ((s + 1.0) * n - 1.0) / 2.0


def _global_coords(coords_bn, batch, n_out):
    """(B, N) per-batch continuous/int coords -> (B*N,) flattened."""
    return coords_bn.reshape(batch * n_out)


def _fold_channels_major(volume_flat):
    """(B, C, N_in) -> ((C, B*N_in), n_in)."""
    B, C, n_in = volume_flat.shape
    return jnp.transpose(volume_flat, (1, 0, 2)).reshape(C, B * n_in), n_in


def _batch_offsets(n_theta, n_batch, n_in, n_out, dtype=jnp.int32):
    """(n_theta*N_out,) global gather offsets. When several affines share one
    volume (n_theta = M * n_batch), point-row m samples volume m % n_batch."""
    batch_ids = jnp.arange(n_theta, dtype=dtype) % n_batch
    return jnp.repeat(batch_ids * n_in, n_out)


@partial(jax.jit, static_argnames=('out_dhw', 'mode'))
def grid_sample(volume, theta, out_dhw, mode='trilinear'):
    """Affine grid sample of a batched volume.

    Args:
      volume: (B, C, D, H, W).
      theta: (T, 4, 4) or (T, 3, 4) grid-space affines, T a multiple of B. When
        T = M * B (several affines sharing one volume, e.g. per-view resamples of
        the same label volume), affine row t samples volume t % B — the volume is
        never duplicated.
      out_dhw: static (Do, Ho, Wo).
      mode: 'trilinear' | 'nearest'.

    Returns: (T, C, Do, Ho, Wo), dtype of ``volume``.
    """
    B, C, D, H, W = volume.shape
    T = theta.shape[0]
    assert T % B == 0
    do, ho, wo = out_dhw
    n_out = do * ho * wo
    cdtype = jnp.float32 if theta.dtype != jnp.float64 else jnp.float64

    sx, sy, sz = _sample_points(theta[:, :3, :], out_dhw, cdtype)
    ix = _to_vox(sx, W).reshape(T * n_out)
    iy = _to_vox(sy, H).reshape(T * n_out)
    iz = _to_vox(sz, D).reshape(T * n_out)

    flat, n_in = _fold_channels_major(volume.reshape(B, C, D * H * W))
    base = _batch_offsets(T, B, n_in, n_out)

    if mode == 'nearest':
        xi = jnp.round(ix).astype(jnp.int32)
        yi = jnp.round(iy).astype(jnp.int32)
        zi = jnp.round(iz).astype(jnp.int32)
        valid = ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H) & (zi >= 0) & (zi < D))
        xi = jnp.clip(xi, 0, W - 1)
        yi = jnp.clip(yi, 0, H - 1)
        zi = jnp.clip(zi, 0, D - 1)
        vals = jnp.take(flat, base + (zi * H + yi) * W + xi, axis=1)  # (C, T*N)
        out = jnp.where(valid[None, :], vals, jnp.zeros((), volume.dtype))
        out = jnp.transpose(out.reshape(C, T, n_out), (1, 0, 2))
        return out.reshape(T, C, do, ho, wo)

    if mode != 'trilinear':
        raise ValueError(f"unknown mode {mode!r}")

    # Cell assignment with an epsilon-nudged floor. XLA clones the coordinate
    # arithmetic into the gather-index and the interpolation-weight fusions,
    # and the clones may round differently (FMA contraction varies per fusion;
    # observed on XLA:CPU, where optimization_barrier does not stop the
    # cloning): at i == k - eps, floor() then disagrees between the two sites
    # and the ~1 weight lands on the wrong corner — whole output planes came
    # out one voxel off while eager/torch agree. Nudging the floor by more
    # than the worst-case clone divergence (a few f32 ulps at coordinate
    # magnitude <= ~256 voxels) makes every clone pick the SAME cell, and the
    # clamped fraction bounds the residual weight error by the nudge (6e-5).
    #
    # Gradient-at-knot caveat: the clamp max(i - i0, 0) zeroes d(out)/d(coord)
    # for coordinates within 2^-14 BELOW an integer, and exact integers take
    # the floor's one-sided subgradient — torch's grid_sample picks the other
    # convention at ties. This only bites theta gradients (the ATM slicing
    # path) when a sample sits exactly on a voxel knot — measure-zero under
    # the random augmentations, systematic only for exactly axis-aligned
    # identity view affines, where the true derivative is discontinuous anyway.
    eps = jnp.asarray(2.0 ** -14, cdtype)
    x0 = jnp.floor(ix + eps)
    y0 = jnp.floor(iy + eps)
    z0 = jnp.floor(iz + eps)
    fx = jnp.maximum(ix - x0, 0.0).astype(cdtype)
    fy = jnp.maximum(iy - y0, 0.0).astype(cdtype)
    fz = jnp.maximum(iz - z0, 0.0).astype(cdtype)
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    z0 = z0.astype(jnp.int32)

    def axis_weight(i0, f, n, base_i, delta):
        """Weight of the cell corner at base_i + delta for a point whose true
        corners are i0 (weight 1-f) and i0+1 (weight f), zero outside [0, n)."""
        j = base_i + delta
        w_lo = jnp.where((j == i0) & (i0 >= 0) & (i0 <= n - 1), 1.0 - f, 0.0)
        w_hi = jnp.where((j == i0 + 1) & (i0 + 1 >= 0) & (i0 + 1 <= n - 1), f, 0.0)
        return w_lo + w_hi

    if C <= 8:
        # TPU gathers cost ~constant time per ROW regardless of width (measured:
        # 6-channel rows price like 1-channel). Fetch all 8 trilinear corners of a
        # point as one wide row from a shifted-stack operand: 1 gather instead of 8.
        padded = jnp.pad(volume, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 1)),
                         mode='edge')
        cells = jnp.stack(
            [padded[:, :, dz:dz + D, dy:dy + H, dx:dx + W]
             for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)],
            axis=1)  # (B, 8, C, D, H, W)
        op = jnp.transpose(cells.reshape(B, 8 * C, D * H * W),
                           (1, 0, 2)).reshape(8 * C, B * (D * H * W))

        # clamp the cell base so {base, base+1} always covers the in-range corners
        bz = jnp.clip(z0, 0, max(D - 2, 0))
        by = jnp.clip(y0, 0, max(H - 2, 0))
        bx = jnp.clip(x0, 0, max(W - 2, 0))
        rows = jnp.take(op, base + (bz * H + by) * W + bx, axis=1)  # (8C, T*N)

        acc = jnp.zeros((C, T * n_out), dtype=cdtype)
        k = 0
        for dz in (0, 1):
            wz = axis_weight(z0, fz, D, bz, dz)
            for dy in (0, 1):
                wy = axis_weight(y0, fy, H, by, dy)
                for dx in (0, 1):
                    wx = axis_weight(x0, fx, W, bx, dx)
                    w = (wz * wy * wx)[None, :]
                    acc = acc + rows[k * C:(k + 1) * C].astype(cdtype) * w
                    k += 1
    else:
        acc = jnp.zeros((C, T * n_out), dtype=cdtype)
        for dz in (0, 1):
            wz = fz if dz else (1.0 - fz)
            zi = z0 + dz
            vz = (zi >= 0) & (zi < D)
            zc = jnp.clip(zi, 0, D - 1)
            for dy in (0, 1):
                wy = fy if dy else (1.0 - fy)
                yi = y0 + dy
                vy = vz & (yi >= 0) & (yi < H)
                yc = jnp.clip(yi, 0, H - 1)
                for dx in (0, 1):
                    wx = fx if dx else (1.0 - fx)
                    xi = x0 + dx
                    v = vy & (xi >= 0) & (xi < W)
                    xc = jnp.clip(xi, 0, W - 1)
                    w = jnp.where(v, wz * wy * wx, 0.0)
                    vals = jnp.take(flat, base + (zc * H + yc) * W + xc, axis=1)
                    acc = acc + vals.astype(cdtype) * w[None, :]

    out = jnp.transpose(acc.reshape(C, T, n_out), (1, 0, 2))
    return out.reshape(T, C, do, ho, wo).astype(volume.dtype)


def nifti_grid_sample(volume, nii_affine, target_fov_mm=None, target_fov_vox=None,
                      is_label=False, pre_grid_sample_affine=None):
    """Resample a NIfTI volume to a target FOV, preserving physical geometry.

    The physical-space anchor is the input volume center; orientation/translation
    changes enter through ``pre_grid_sample_affine`` (grid space). The returned
    output NIfTI affine keeps RAS+ mm geometry consistent with the resampled array.

    Args:
      volume: (B, C, D, H, W). Integer dtypes are sampled in float32.
      nii_affine: (B, 4, 4) vox->RAS affine of ``volume``.
      target_fov_mm: (3,) target physical extent (D, H, W order); default keeps input.
      target_fov_vox: static (3,) ints; default keeps input shape.
      is_label: nearest sampling if True, else trilinear with min-shift so that
        zero-padding pads with the volume minimum (reference nifti_utils.py:194-203).
      pre_grid_sample_affine: optional (T, 4, 4) grid-space affines, T a multiple
        of B: several affines may share one volume (see grid_sample).

    Returns: (resampled (T, C, *target_fov_vox), grid_affine (T, 4, 4),
              out_nii_affine (T, 4, 4)).

    Parity: ``nifti_grid_sample`` (reference nifti_utils.py:112-207).
    """
    B, C, D, H, W = volume.shape
    in_shape = (D, H, W)
    if target_fov_vox is None:
        target_fov_vox = in_shape
    target_fov_vox = tuple(int(v) for v in target_fov_vox)

    if target_fov_mm is None:
        from acquisition_focus_tpu.ops.affine import affine_zooms
        target_fov_mm = affine_zooms(nii_affine) * jnp.asarray(in_shape, nii_affine.dtype)

    affine_nii = nii_affine
    if pre_grid_sample_affine is not None \
            and pre_grid_sample_affine.shape[0] != nii_affine.shape[0]:
        reps = pre_grid_sample_affine.shape[0] // nii_affine.shape[0]
        affine_nii = jnp.tile(nii_affine, (reps, 1, 1))
        if hasattr(target_fov_mm, 'ndim') and getattr(target_fov_mm, 'ndim', 1) > 1:
            target_fov_mm = jnp.tile(target_fov_mm, (reps, 1))

    grid_affine, out_nii = grid_affines_for_fov(
        affine_nii, in_shape, target_fov_mm, jnp.asarray(target_fov_vox),
        pre_grid_sample_affine)

    in_dtype = volume.dtype
    if not jnp.issubdtype(in_dtype, jnp.floating):
        volume = volume.astype(jnp.float32)

    if is_label:
        out = grid_sample(volume, grid_affine, target_fov_vox, mode='nearest')
    else:
        min_value = volume.min()
        out = grid_sample(volume - min_value, grid_affine, target_fov_vox,
                          mode='trilinear') + min_value

    return out.astype(in_dtype), grid_affine, out_nii


def nifti_grid_sample_nodiff(volume, nii_affine, target_fov_mm=None,
                             target_fov_vox=None, is_label=False,
                             pre_grid_sample_affine=None, force_kernel=None):
    """Forward-only :func:`nifti_grid_sample` with a fast TPU path.

    Identical semantics/geometry, but NOT differentiable: on TPU, supported
    trilinear resamples run through the Pallas bbox-DMA MXU kernel
    (ops.pallas.volume_resample — measured ~4x the XLA gather path on the
    prescan workload); everything else falls back to :func:`nifti_grid_sample`.
    The kernel's bbox-coverage precondition is additionally checked at RUNTIME
    against the actual grid-affine coefficients (``kernel_scale_fits``): an
    out-of-scale affine — e.g. a dataset whose nii spacing disagrees with the
    configured FOV, or view affines carrying zoom/shear — takes the exact gather
    branch of a ``lax.cond`` instead of silently clamping the kernel's bbox.
    Call sites must be under ``stop_gradient`` (the prescan resample feeding the
    localization nets, reference learnable_transform.py:248-255).

    ``force_kernel=True`` skips the backend check (tests drive the kernel glue in
    Pallas interpret mode on CPU); ``None`` = auto.
    """
    from acquisition_focus_tpu.ops.pallas.volume_resample import (
        BBOX_LARGE, BBOX_SMALL, affine_volume_resample_pallas,
        kernel_scale_fits, supports_affine_volume_resample)

    B, C, D, H, W = volume.shape
    on_tpu = jax.default_backend() == 'tpu' if force_kernel is None \
        else bool(force_kernel)
    # gate on the SMALL bbox: its input-size requirement is the weakest
    # (LARGE-support implies SMALL-support, not vice versa), so volumes that
    # only fit the small kernel still reach the Pallas path; the cascade below
    # re-checks LARGE statically before offering it as a branch
    use_kernel = (not is_label and on_tpu
                  and target_fov_vox is not None
                  and supports_affine_volume_resample(
                      (D, H, W), tuple(int(v) for v in target_fov_vox), C,
                      BBOX_SMALL))
    if not use_kernel:
        return nifti_grid_sample(volume, nii_affine, target_fov_mm,
                                 target_fov_vox, is_label,
                                 pre_grid_sample_affine)

    target_fov_vox = tuple(int(v) for v in target_fov_vox)
    if target_fov_mm is None:
        # same default as nifti_grid_sample: keep the input physical extent
        from acquisition_focus_tpu.ops.affine import affine_zooms
        target_fov_mm = affine_zooms(nii_affine) * jnp.asarray(
            (D, H, W), nii_affine.dtype)
    affine_nii = nii_affine
    if pre_grid_sample_affine is not None \
            and pre_grid_sample_affine.shape[0] != nii_affine.shape[0]:
        reps = pre_grid_sample_affine.shape[0] // nii_affine.shape[0]
        affine_nii = jnp.tile(nii_affine, (reps, 1, 1))
        if hasattr(target_fov_mm, 'ndim') and getattr(target_fov_mm, 'ndim', 1) > 1:
            target_fov_mm = jnp.tile(target_fov_mm, (reps, 1))

    grid_affine, out_nii = grid_affines_for_fov(
        affine_nii, (D, H, W), target_fov_mm, jnp.asarray(target_fov_vox),
        pre_grid_sample_affine)

    in_dtype = volume.dtype
    if not jnp.issubdtype(in_dtype, jnp.floating):
        volume = volume.astype(jnp.float32)
    min_value = volume.min()

    def kernel_branch(bbox):
        def branch(v):
            return affine_volume_resample_pallas(
                v - min_value, grid_affine, target_fov_vox, bbox) + min_value
        return branch

    def gather_branch(v):
        return grid_sample(v - min_value, grid_affine, target_fov_vox,
                           mode='trilinear') + min_value

    # bbox cascade: the SMALL bbox kernel is ~2.9x cheaper (MXU work and DMA
    # traffic both scale with the bbox volume) and covers the prescan path's
    # near-unit scales; LARGE covers scales to ~1.45; anything wider takes the
    # exact gather. Both fits-checks are tight per-affine bounds, so the
    # dispatch is exact, never clamping. The nesting keeps each branch's work
    # inside its cond (only the taken branch executes at runtime).
    if supports_affine_volume_resample(
            (D, H, W), target_fov_vox, C, BBOX_LARGE):
        def large_cascade(v):
            return jax.lax.cond(
                kernel_scale_fits(grid_affine, target_fov_vox, (D, H, W),
                                  BBOX_LARGE),
                kernel_branch(BBOX_LARGE), gather_branch, v)
    else:
        # input too small for the LARGE bbox DMA: the cascade tail is the
        # exact gather directly
        large_cascade = gather_branch

    out = jax.lax.cond(
        kernel_scale_fits(grid_affine, target_fov_vox, (D, H, W), BBOX_SMALL),
        kernel_branch(BBOX_SMALL), large_cascade, volume)
    return out.astype(in_dtype), grid_affine, out_nii


@partial(jax.jit, static_argnames=('out_spat',))
def sample_slice_into_volume(slices, theta, out_spat):
    """Trilinearly resample a single-plane volume, without materializing it.

    Equivalent to: build an (S, S, S) zero volume, write ``slices`` into plane
    w = S//2, and ``grid_sample(volume, theta, (out_spat,)*3, 'trilinear')``.
    Because every other plane is zero, the trilinear sample factorizes into a 2D
    bilinear sample of the plane times a triangular weight on the distance of the
    continuous w coordinate to the plane.

    Args:
      slices: (B, C, S, S) — the (D, H) extent of the embedded plane.
      theta: (B, 4, 4) grid-space affine (volume -> plane space).
      out_spat: static int, output volume edge length.

    Returns: (B, C, out_spat, out_spat, out_spat).

    Parity: ``SkipConnector.forward`` (reference hybrid_unet.py:71-94).
    """
    B, C, S, S2 = slices.shape
    assert S == S2
    n_out = out_spat ** 3
    cdtype = jnp.float32

    sx, sy, sz = _sample_points(theta[:, :3, :], (out_spat,) * 3, cdtype)
    ix = _to_vox(sx, S).reshape(B * n_out)   # W axis: plane position
    iy = _to_vox(sy, S).reshape(B * n_out)   # H axis: slice dim 3
    iz = _to_vox(sz, S).reshape(B * n_out)   # D axis: slice dim 2

    plane_w = jnp.maximum(0.0, 1.0 - jnp.abs(ix - (S // 2)))

    # epsilon-nudged cell assignment: keeps XLA's differently-rounded clones of
    # the coordinate arithmetic on the SAME corner (see grid_sample)
    eps = jnp.asarray(2.0 ** -14, cdtype)
    y0 = jnp.floor(iy + eps)
    z0 = jnp.floor(iz + eps)
    fy = jnp.maximum(iy - y0, 0.0).astype(cdtype)
    fz = jnp.maximum(iz - z0, 0.0).astype(cdtype)
    y0 = y0.astype(jnp.int32)
    z0 = z0.astype(jnp.int32)

    flat, n_in = _fold_channels_major(slices.reshape(B, C, S * S))
    base = _batch_offsets(B, B, n_in, n_out)

    acc = jnp.zeros((C, B * n_out), dtype=cdtype)
    for dz in (0, 1):
        wz = fz if dz else (1.0 - fz)
        zi = z0 + dz
        vz = (zi >= 0) & (zi < S)
        zc = jnp.clip(zi, 0, S - 1)
        for dy in (0, 1):
            wy = fy if dy else (1.0 - fy)
            yi = y0 + dy
            v = vz & (yi >= 0) & (yi < S)
            yc = jnp.clip(yi, 0, S - 1)
            w = jnp.where(v, plane_w * wz * wy, 0.0)
            vals = jnp.take(flat, base + zc * S + yc, axis=1)
            acc = acc + vals.astype(cdtype) * w[None, :]

    out = jnp.transpose(acc.reshape(C, B, n_out), (1, 0, 2))
    return out.reshape(B, C, out_spat, out_spat, out_spat).astype(slices.dtype)


def crop_around_label_center(label, nii_affine, target_fov_mm, target_fov_vox,
                             image=None, center_mode='mean'):
    """Crop/resample around the foreground center of a label volume.

    Args:
      label: (B, C, D, H, W) integer-valued label volume.
      nii_affine: (B, 4, 4).
      target_fov_mm: (3,). target_fov_vox: static (3,) ints (-1 keeps that axis).
      image: optional (B, C, D, H, W) intensity volume resampled with the same crop.
      center_mode: 'mean' (mass center, truncated to int) or 'minmax' (bbox center).

    Returns: (cropped_label, cropped_image_or_None, cropped_nii_affine).

    Parity: ``crop_around_label_center`` (reference nifti_utils.py:211-250).
    """
    assert center_mode in ('mean', 'minmax')
    B = label.shape[0]
    spatial = label.shape[2:]
    target_fov_vox = tuple(
        int(s) if int(t) == -1 else int(t) for s, t in zip(spatial, target_fov_vox))

    mask = (label != 0).any(axis=1)  # (B, D, H, W)
    coords = [jnp.arange(n, dtype=jnp.float32) for n in spatial]
    grids = jnp.meshgrid(*coords, indexing='ij')

    centers = []
    for g in grids:
        gb = jnp.broadcast_to(g[None], mask.shape)
        if center_mode == 'mean':
            c = (gb * mask).sum(axis=(1, 2, 3)) / jnp.maximum(mask.sum(axis=(1, 2, 3)), 1)
            c = jnp.trunc(c)
        else:
            lo = jnp.min(jnp.where(mask, gb, jnp.inf), axis=(1, 2, 3))
            hi = jnp.max(jnp.where(mask, gb, -jnp.inf), axis=(1, 2, 3))
            c = jnp.round((lo + hi) / 2.0)
        centers.append(c)
    center = jnp.stack(centers, axis=-1)  # (B, 3) in (d, h, w) vox order

    shape_dhw = jnp.asarray(spatial, jnp.float32)
    pre = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))
    # grid-space translation is in (x->W, y->H, z->D) vector order => flip
    pre = pre.at[:, :3, 3].set(vox_to_grid_offset(center, shape_dhw)[:, ::-1])

    cropped_image = None
    if image is not None:
        cropped_image, _, _ = nifti_grid_sample(
            image, nii_affine, target_fov_mm, target_fov_vox,
            is_label=False, pre_grid_sample_affine=pre)
    cropped_label, _, cropped_nii = nifti_grid_sample(
        label, nii_affine, target_fov_mm, target_fov_vox,
        is_label=True, pre_grid_sample_affine=pre)
    return cropped_label, cropped_image, cropped_nii


def resize_trilinear(x, out_dhw):
    """Half-pixel-center trilinear resize of (B, C, D, H, W) (edge clamped), matching
    torch ``F.interpolate(mode='trilinear', align_corners=False)`` semantics used for
    slice upsampling (reference run_dl.py:193-197)."""
    B, C = x.shape[:2]
    return jax.image.resize(x, (B, C) + tuple(out_dhw), method='linear')
