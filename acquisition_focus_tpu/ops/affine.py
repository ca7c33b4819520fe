"""Physical-geometry affine algebra for NIfTI-aware resampling.

All functions operate on batched homogeneous 4x4 matrices of shape (..., 4, 4) and are
pure jnp — safe to use both on host (numpy inputs) and inside jit.

Conventions
-----------
Two coordinate systems appear throughout:

* ``vox`` space: integer voxel indices (i, j, k) of an array laid out as (D, H, W).
  A NIfTI affine maps (i, j, k, 1) -> (x, y, z, 1) in RAS+ millimetres.
* ``grid`` space: the normalized [-1, 1] sampling space used by the resampler
  (``ops.resample.grid_sample``), where the coordinate vector is ordered
  (x->W, y->H, z->D) — i.e. the *reverse* of the vox axis order — and, with
  ``align_corners=False`` semantics, voxel centers of an N-long axis sit at
  (2*i + 1)/N - 1.

Reference behavior being matched (re-derived, not translated):
/root/reference/acquisition_focus/utils/nifti_utils.py:19-83 (axis switching,
pix<->grid offset conversion, column rescaling, grid + output-nifti affine assembly).
"""

import functools

import jax
import jax.numpy as jnp

# Affine matrices are 4x4: negligible FLOPs, but geometry must be exact. TPU matmuls
# default to bf16 accumulation — always compose affines at full precision.
_HIGHEST = jax.lax.Precision.HIGHEST


def compose(*mats):
    """Chain homogeneous matrix products at full float precision."""
    return functools.reduce(
        lambda a, b: jnp.matmul(a, b, precision=_HIGHEST), mats)


def reverse_spatial_axes(mat):
    """Conjugate a homogeneous matrix by the permutation that reverses the three
    spatial axes (x<->z), keeping the homogeneous row/column in place.

    This converts a matrix acting on (i, j, k, 1) vectors into the equivalent matrix
    acting on (k, j, i, 1) vectors — the bridge between NIfTI vox order (D, H, W) and
    grid-space vector order (W, H, D).

    Parity: ``switch_0_2_mat_dim`` (reference nifti_utils.py:19-23).
    """
    perm = jnp.asarray([2, 1, 0, 3])
    return mat[..., perm, :][..., :, perm]


def affine_zooms(mat):
    """Per-axis spacing of an affine: the Euclidean norm of each of the first three
    columns of the 3x3 linear part. Shape (..., 3).

    Parity: ``get_zooms`` (reference nifti_utils.py:254-255).
    """
    lin = mat[..., :3, :3]
    return jnp.sqrt((lin * lin).sum(axis=-2))


def scale_affine_columns(mat, scale):
    """Right-multiply by diag(scale, 1): scales the first three columns of the linear
    part (and leaves translation untouched).

    Parity: ``rescale_rot_components_with_diag`` (reference nifti_utils.py:27-32).
    """
    scale = jnp.asarray(scale)
    pad = jnp.ones(scale.shape[:-1] + (1,), dtype=mat.dtype)
    diag = jnp.concatenate([scale.astype(mat.dtype), pad], axis=-1)
    return mat * diag[..., None, :]


def normalize_affine_columns(mat):
    """Divide the first three columns of the linear part by their norms, producing a
    pure-rotation (plus translation) matrix."""
    return scale_affine_columns(mat, 1.0 / affine_zooms(mat))


def vox_to_grid_offset(t_vox, shape_dhw):
    """Convert a voxel-space translation to a grid-space ([-1, 1]) translation under
    align_corners=False semantics: t_grid = 2 * t_vox / N - 1.

    Parity: ``get_torch_translation_from_pix_translation`` (nifti_utils.py:81-83).
    """
    return t_vox * 2.0 / shape_dhw - 1.0


def grid_to_vox_offset(t_grid, shape_dhw):
    """Inverse of :func:`vox_to_grid_offset`: t_vox = (t_grid + 1) / 2 * N.

    Parity: ``get_pix_translation_from_torch_translation`` (nifti_utils.py:75-77).
    """
    return (t_grid + 1.0) / 2.0 * shape_dhw


def grid_affines_for_fov(vol_nii_affine, vol_shape_dhw, target_fov_mm, target_fov_vox,
                         pre_grid_sample_affine=None):
    """Build the grid-space sampling affine and the output NIfTI affine for resampling
    a volume to a target field-of-view.

    The sampling geometry is anchored at the *center* of the input volume (the
    physical-space transform is a no-op; orientation changes come exclusively through
    ``pre_grid_sample_affine``). Because of that anchoring, the identity-based part of
    the reference's pipeline (nii⁻¹ @ noop-RAS, nifti_utils.py:98-108,40-49) collapses
    analytically to the identity matrix, so we never materialize or invert it — only
    the FOV column rescale remains.

    Args:
      vol_nii_affine: (..., 4, 4) NIfTI affine of the input volume (vox -> RAS mm).
      vol_shape_dhw: static (3,) ints — the input volume spatial shape (D, H, W).
      target_fov_mm: (3,) target physical extent in mm, ordered like (D, H, W).
      target_fov_vox: (3,) target voxel counts (D, H, W).
      pre_grid_sample_affine: optional (..., 4, 4) grid-space affine applied to the
        sampling coordinates (learned / view orientation). Identity if None.

    Returns:
      (grid_affine, out_nii_affine):
        grid_affine: (..., 4, 4) affine consumed by ``ops.resample.grid_sample``.
        out_nii_affine: (..., 4, 4) NIfTI affine of the resampled output, preserving
          physical RAS+ geometry (incl. the -(fov-1)/2 voxel-center shift,
          reference nifti_utils.py:60-71).
    """
    dtype = vol_nii_affine.dtype
    fov_vox_i = jnp.asarray(vol_shape_dhw, dtype=dtype)
    target_fov_mm = jnp.asarray(target_fov_mm, dtype=dtype)
    target_fov_vox = jnp.asarray(target_fov_vox, dtype=dtype)

    zooms_i = affine_zooms(vol_nii_affine)              # (..., 3) input spacing
    fov_mm_i = zooms_i * fov_vox_i                      # (..., 3) input physical extent

    if pre_grid_sample_affine is None:
        base = jnp.broadcast_to(jnp.eye(4, dtype=dtype), vol_nii_affine.shape)
    else:
        base = pre_grid_sample_affine.astype(dtype)

    # Normalize columns, then scale so one unit of grid space spans target_fov_mm
    # of physical space. Grid-vector order is (W, H, D) => flip to vox order. Note the
    # flip covers the whole scaler including the column norms — an exact match of the
    # reference (nifti_utils.py:55-58); the two are identical whenever the pre-affine
    # has isotropic column norms (rotations x isotropic zoom), which holds for every
    # affine the pipeline produces.
    scaler = ((target_fov_mm / fov_mm_i) / affine_zooms(base))[..., ::-1]
    grid_affine = scale_affine_columns(base, scaler)

    # Output NIfTI affine: map output vox -> input vox -> RAS mm.
    nii = reverse_spatial_axes(grid_affine)
    nii = scale_affine_columns(nii, fov_mm_i / (target_fov_vox * zooms_i))
    nii = nii.at[..., :3, -1].set(grid_to_vox_offset(nii[..., :3, -1], fov_vox_i))
    # Half-FOV shift so that output voxel (0,0,0)'s center lands correctly: the grid
    # affine addresses the FOV center; NIfTI addresses the corner voxel.
    center_shift = jnp.einsum(
        '...ij,...jk,...k->...i',
        vol_nii_affine[..., :3, :3], nii[..., :3, :3],
        jnp.broadcast_to(-(target_fov_vox - 1.0) / 2.0, nii[..., :3, -1].shape),
        precision=_HIGHEST,
    )
    nii = compose(vol_nii_affine, nii)
    nii = nii.at[..., :3, -1].add(center_shift)
    return grid_affine, nii
