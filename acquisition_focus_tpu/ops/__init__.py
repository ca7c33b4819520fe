from acquisition_focus_tpu.ops.affine import (
    affine_zooms,
    grid_affines_for_fov,
    grid_to_vox_offset,
    normalize_affine_columns,
    reverse_spatial_axes,
    scale_affine_columns,
    vox_to_grid_offset,
)
from acquisition_focus_tpu.ops.resample import (
    crop_around_label_center,
    grid_sample,
    nifti_grid_sample,
    sample_slice_into_volume,
)
from acquisition_focus_tpu.ops.rotations import (
    random_affine,
    rotation_from_angle_axis,
    rotation_from_normal,
    rotation_from_r6,
)
