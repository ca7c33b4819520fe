"""Geometry layer tests: moments parity vs the reference sparse implementation,
clinical view derivation on a synthetic phantom, centroid registration."""

import numpy as np
import pytest
import jax.numpy as jnp

from acquisition_focus_tpu.data.synthetic import make_heart_phantom
from acquisition_focus_tpu.geometry.moments import (
    label_center_and_median, label_inertia_tensor, principal_axes)
from acquisition_focus_tpu.geometry.clinical_views import (
    get_class_volumes, get_clinical_cardiac_view_affines, min_max_extent_along_axis)
from acquisition_focus_tpu.geometry.centroids import register_centroids

from conftest import import_reference_module, reference_available


@pytest.fixture(scope="module")
def phantom():
    return make_heart_phantom(shape=(64, 64, 64), seed=1)


CLASS_DICT = {"background": 0, "MYO": 1, "LV": 2, "RV": 3, "LA": 4, "RA": 5}


class TestMoments:
    @pytest.mark.skipif(not reference_available(), reason="reference not mounted")
    def test_inertia_parity(self, phantom):
        import torch
        ref = import_reference_module("acquisition_focus.utils.torch_sparse_tensor_utils")
        label, _, _ = phantom
        mask = (label == 2).astype(np.int64)
        t_center, t_inertia = ref.get_inertia_tensor(torch.as_tensor(mask))
        center, inertia = label_inertia_tensor(jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(center), t_center.numpy(), atol=1e-3)
        np.testing.assert_allclose(np.asarray(inertia), t_inertia.numpy(),
                                   rtol=2e-4, atol=1.0)

    @pytest.mark.skipif(not reference_available(), reason="reference not mounted")
    def test_center_median_parity(self, phantom):
        import torch
        ref = import_reference_module("acquisition_focus.utils.torch_sparse_tensor_utils")
        label, _, _ = phantom
        mask = (label == 1).astype(np.int64)
        t_center, t_median = ref.get_center_and_median(torch.as_tensor(mask))
        center, median = label_center_and_median(jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(center), t_center.numpy(), atol=1e-3)
        np.testing.assert_allclose(np.asarray(median), t_median.numpy(), atol=1.0)

    def test_principal_axes_of_prolate_cloud(self, phantom):
        label, _, _ = phantom
        # LV+MYO is prolate along the phantom long axis: min-inertia axis ~ long axis
        mask = np.isin(label, (1, 2))
        _, inertia = label_inertia_tensor(jnp.asarray(mask))
        mn, md, mx = principal_axes(inertia)
        mn = np.asarray(mn)
        idx = np.argwhere(mask).astype(np.float64)
        idx -= idx.mean(0)
        spread = np.abs(idx @ mn).mean()
        for other in (md, mx):
            assert spread > np.abs(idx @ np.asarray(other)).mean()


class TestClinicalViews:
    def test_views_structure(self, phantom):
        label, _, affine = phantom
        views = get_clinical_cardiac_view_affines(
            label, affine, CLASS_DICT, num_sa_slices=3, return_unrolled=True)
        expected = {'axial', 'sagittal', 'coronal', 'p2CH', 'p4CH',
                    'SA-0', 'SA-1', 'SA-2', '4CH', '2CH'}
        assert expected == set(views)
        for name, aff in views.items():
            lin = aff[:3, :3]
            np.testing.assert_allclose(lin @ lin.T, np.eye(3), atol=1e-6,
                                       err_msg=f"{name} not orthonormal")

    def test_missing_structures_empty(self):
        label = np.zeros((16, 16, 16), np.int32)
        assert get_clinical_cardiac_view_affines(label, np.eye(4), CLASS_DICT) == {}

    @pytest.mark.skipif(not reference_available(), reason="reference not mounted")
    def test_view_normals_parity(self, phantom):
        import torch
        ref = import_reference_module("acquisition_focus.functional.clinical_cardiac_views")
        label, _, affine = phantom
        ours = get_clinical_cardiac_view_affines(
            label, affine, CLASS_DICT, num_sa_slices=3, return_unrolled=True)
        theirs = ref.get_clinical_cardiac_view_affines(
            torch.as_tensor(label.astype(np.int64)), torch.as_tensor(affine),
            CLASS_DICT, num_sa_slices=3, return_unrolled=True)
        for name in ours:
            a, b = ours[name], theirs[name].numpy()
            # Principal-axis sign is arbitrary between eig/eigh, so in-plane frames
            # may be rotated 180 deg; the slice *plane* (normal direction, stored
            # reversed in the grid affine's first column) and the center must agree.
            n_a = a[:3, 0][::-1]
            n_b = b[:3, 0][::-1]
            assert abs(n_a @ n_b) > 0.98, f"{name}: normals diverge ({n_a} vs {n_b})"
            np.testing.assert_allclose(a[:3, 3], b[:3, 3], atol=0.05,
                                       err_msg=f"{name} center diverges")

    def test_extent_search(self, phantom):
        label, _, _ = phantom
        mask = np.isin(label, (1, 2))
        _, inertia = label_inertia_tensor(jnp.asarray(mask))
        axis = np.asarray(principal_axes(inertia)[0])
        p_pos, p_neg = min_max_extent_along_axis(mask, axis)
        length = np.linalg.norm(p_pos - p_neg)
        # phantom LV+MYO long-axis extent at 64^3: 2*(26+4)*64/96 = 40 vox
        assert 28 < length < 52, length


class TestClassVolumes:
    def test_volumes(self):
        label = np.zeros((1, 8, 8, 8), np.int32)
        label[0, :2] = 1  # 128 voxels
        spacing = np.array([[2.0, 1.0, 1.0]])
        vols = np.asarray(get_class_volumes(label, spacing, 3, unit='ml'))
        assert vols.shape == (1, 3)
        np.testing.assert_allclose(vols[0, 1], 128 * 2.0 * 1e-3, rtol=1e-6)
        np.testing.assert_allclose(vols[0, 0], (512 - 128) * 2.0 * 1e-3, rtol=1e-6)
        np.testing.assert_allclose(vols[0, 2], 0.0)


class TestCentroidRegistration:
    def test_recovers_rotation(self, phantom):
        from scipy.ndimage import affine_transform
        fixed, _, _ = phantom
        # rotate the phantom by a known rotation around the center
        from acquisition_focus_tpu.data.synthetic import _rotation_from_axis_angle
        rot = _rotation_from_axis_angle(np.array([0.3, 1.0, 0.2]), 0.4)
        center = np.asarray(fixed.shape) / 2.0
        moving = affine_transform(
            fixed, rot.T, offset=center - rot.T @ center, order=0)

        aff = np.asarray(register_centroids(fixed, moving.astype(np.int32), dof=6))
        assert aff.shape == (4, 4)
        # fitted transform maps moving centroids onto fixed: its inverse linear part
        # should resemble a rotation close to `rot` acting in flipped grid coords
        lin = aff[:3, :3]
        np.testing.assert_allclose(lin @ lin.T, np.eye(3), atol=0.15)

        # residual after alignment must be far below the initial offset
        from acquisition_focus_tpu.geometry.centroids import _class_centers_grid_space
        classes = [c for c in np.unique(fixed) if c != 0]
        f = _class_centers_grid_space(fixed, classes)
        m = _class_centers_grid_space(moving, classes)
        before = np.mean((m - f) ** 2)
        after = np.mean(((np.linalg.inv(aff) @ m.T).T - f) ** 2)
        assert after < before * 0.2, (before, after)


class TestNiftiIO:
    def test_roundtrip(self, tmp_path, rng):
        from acquisition_focus_tpu.data.nifti_io import load_nifti, save_nifti
        data = rng.normal(size=(10, 12, 14)).astype(np.float32)
        affine = np.eye(4)
        affine[:3, :3] = np.diag([1.5, 1.2, 0.8])
        affine[:3, 3] = [-5, 3, 2]
        for name in ("a.nii", "a.nii.gz"):
            save_nifti(tmp_path / name, data, affine)
            out, aff = load_nifti(tmp_path / name)
            np.testing.assert_allclose(out, data, atol=1e-6)
            np.testing.assert_allclose(aff, affine, atol=1e-5)

    def test_int_roundtrip(self, tmp_path):
        from acquisition_focus_tpu.data.nifti_io import load_nifti, save_nifti
        data = np.arange(60, dtype=np.int16).reshape(3, 4, 5)
        save_nifti(tmp_path / "l.nii.gz", data, np.eye(4))
        out, _ = load_nifti(tmp_path / "l.nii.gz")
        assert out.dtype == np.int16
        np.testing.assert_array_equal(out, data)

    @pytest.mark.skipif(not reference_available(), reason="reference not mounted")
    def test_memory_layout_matches_fortran_convention(self, tmp_path):
        # i must be fastest-varying on disk (nibabel convention)
        from acquisition_focus_tpu.data.nifti_io import load_nifti, save_nifti
        data = np.zeros((4, 3, 2), np.float32)
        data[1, 0, 0] = 7.0
        save_nifti(tmp_path / "f.nii", data, np.eye(4))
        raw = (tmp_path / "f.nii").read_bytes()
        vals = np.frombuffer(raw[352:], np.float32)
        assert vals[1] == 7.0  # second element on disk = (i=1, j=0, k=0)
