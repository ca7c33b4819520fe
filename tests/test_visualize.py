"""Visualization smoke tests: every figure writer produces a PNG from minimal
inputs (matplotlib Agg; replaces the reference's notebook-only rendering,
visualize/visualize_mmwhs.ipynb)."""

import numpy as np

from acquisition_focus_tpu.utils.visualize import (
    plot_learned_planes, save_frameless_image, slice_input_mosaic)


def test_save_frameless_image(tmp_path, rng):
    path = tmp_path / 'img.png'
    save_frameless_image(rng.random((24, 32)), path)
    assert path.stat().st_size > 0


def test_slice_input_mosaic(rng):
    mosaic = slice_input_mosaic(rng.random((3, 2 * 4, 16, 16)), n_views=2)
    assert mosaic.shape == (2 * 16, 4 * 16)
    assert np.isnan(mosaic).any()  # background masked


def test_plot_learned_planes(tmp_path, rng):
    label = np.zeros((24, 24, 24), np.int32)
    label[8:16, 8:16, 8:16] = rng.integers(1, 4, (8, 8, 8))
    nii = np.eye(4)
    nii[:3, :3] *= 1.5
    nii[:3, 3] = -18.0
    slice_affs = np.stack([np.eye(4) for _ in range(3)])
    slice_affs[1, :3, 3] = [5.0, 0.0, 0.0]
    case_affines = {'transformed_nii_affines': slice_affs}
    path = tmp_path / 'planes.png'
    plot_learned_planes(label, nii, case_affines, path,
                        view_names=['p2CH', 'p4CH', 'SA'],
                        slice_shape=(16, 16))
    assert path.stat().st_size > 0
