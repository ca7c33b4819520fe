from acquisition_focus_tpu.geometry.moments import (
    label_center,
    label_center_and_median,
    label_inertia_tensor,
    principal_axes,
)
from acquisition_focus_tpu.geometry.clinical_views import (
    get_class_volumes,
    get_clinical_cardiac_view_affines,
    grid_affine_from_pix_affine,
    pix_affine_from_center_and_plane_vects,
)
from acquisition_focus_tpu.geometry.centroids import (
    register_centroids,
    centroid_reorient_grid_affine,
)
