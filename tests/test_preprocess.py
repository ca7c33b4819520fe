"""Offline preprocessing (c3d replacement): LPI reorientation, iso resampling,
label remap, crop — physical-geometry preservation checks."""

import numpy as np

from acquisition_focus_tpu.data.preprocess import (
    MMWHS_LABEL_MAP, remap_labels, reorient_to_lpi, resample_iso, preprocess_case,
    write_data_split)


def world_of(affine, idx):
    return affine[:3, :3] @ np.asarray(idx, np.float64) + affine[:3, 3]


class TestReorient:
    def test_lpi_axes_and_content(self, rng):
        # random axis permutation + flips
        data = rng.random((6, 7, 8)).astype(np.float32)
        perm_mat = np.zeros((3, 3))
        perm = [2, 0, 1]
        signs = [-1, 1, -1]
        for i, (p, s) in enumerate(zip(perm, signs)):
            perm_mat[p, i] = s * (1.0 + 0.2 * i)
        affine = np.eye(4)
        affine[:3, :3] = perm_mat
        affine[:3, 3] = [5.0, -3.0, 2.0]

        out, out_aff = reorient_to_lpi(data, affine)
        # every axis direction must be negative-dominant (L, P, I)
        lin = out_aff[:3, :3]
        assert (np.diag(lin) < 0).all()
        assert np.abs(lin - np.diag(np.diag(lin))).max() < 1e-9

        # a marker voxel keeps its world position
        marker = (2, 3, 4)
        val = data[marker]
        w = world_of(affine, marker)
        # find the voxel in the output whose world position matches
        idx = np.linalg.solve(out_aff[:3, :3], w - out_aff[:3, 3])
        idx = tuple(int(round(v)) for v in idx)
        assert out[idx] == val


class TestResampleIso:
    def test_spacing(self, rng):
        data = rng.random((10, 12, 14)).astype(np.float32)
        affine = np.diag([2.0, 1.0, 0.5, 1.0])
        out, out_aff = resample_iso(data, affine, spacing_mm=1.0)
        zooms = np.sqrt((out_aff[:3, :3] ** 2).sum(0))
        np.testing.assert_allclose(zooms, 1.0, atol=1e-4)
        assert out.shape == (20, 12, 7)


class TestRemap:
    def test_mmwhs(self):
        lbl = np.array([0, 205, 500, 600, 420, 550, 7])
        out = remap_labels(lbl, MMWHS_LABEL_MAP)
        np.testing.assert_array_equal(out, [0, 1, 2, 3, 4, 5, 0])


class TestEndToEnd:
    def test_case_pipeline(self, tmp_path, rng):
        from acquisition_focus_tpu.data.nifti_io import load_nifti, save_nifti
        lbl = np.zeros((40, 40, 40), np.int16)
        lbl[15:25, 12:22, 18:28] = 205
        img = rng.random((40, 40, 40)).astype(np.float32)
        aff = np.diag([-1.2, -1.2, -1.2, 1.0])
        aff[:3, 3] = [20, 20, 20]
        save_nifti(tmp_path / 'raw_image.nii.gz', img, aff)
        save_nifti(tmp_path / 'raw_label.nii.gz', lbl, aff)

        img_name, lbl_name = preprocess_case(
            tmp_path / 'raw_image.nii.gz', tmp_path / 'raw_label.nii.gz',
            tmp_path / 'prepared', 'mr_train_1001',
            fov_mm=(24.0,) * 3, fov_vox=(16,) * 3)
        out_lbl, out_aff = load_nifti(tmp_path / 'prepared' / lbl_name)
        assert out_lbl.shape == (16, 16, 16)
        assert set(np.unique(out_lbl)) <= {0, 1}
        assert (out_lbl == 1).sum() > 0
        zooms = np.sqrt((out_aff[:3, :3] ** 2).sum(0))
        np.testing.assert_allclose(zooms, 24.0 / 16, atol=1e-3)

        split = write_data_split(tmp_path / 'prepared',
                                 [img_name, lbl_name], [], num_folds=1)
        assert (tmp_path / 'prepared/metadata/data_split.json').exists()
        assert split['train_folds']['fold_0']
