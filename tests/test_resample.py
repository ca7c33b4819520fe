"""Golden tests for the resampler against torch.nn.functional.grid_sample (the
convention the whole geometry stack is defined in) and against the upstream
reference's NIfTI-aware sampler as an end-to-end oracle."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from acquisition_focus_tpu.ops.affine import affine_zooms, normalize_affine_columns
from acquisition_focus_tpu.ops.resample import (
    crop_around_label_center, grid_sample, nifti_grid_sample, sample_slice_into_volume)

from conftest import import_reference_module, reference_available


def random_theta(rng, b, scale=1.3, offset=0.3):
    thetas = []
    for _ in range(b):
        a = rng.normal(size=(3, 3))
        q, _ = np.linalg.qr(a)
        s = np.diag(rng.uniform(1 / scale, scale, size=3))
        t = np.eye(4)
        t[:3, :3] = q @ s
        t[:3, 3] = rng.uniform(-offset, offset, size=3)
        thetas.append(t)
    return np.stack(thetas).astype(np.float32)


def torch_grid_sample(vol, theta, out_dhw, mode):
    g = torch.nn.functional.affine_grid(
        torch.as_tensor(theta)[:, :3, :], [vol.shape[0], vol.shape[1], *out_dhw],
        align_corners=False)
    return torch.nn.functional.grid_sample(
        torch.as_tensor(vol), g, mode=mode, padding_mode='zeros',
        align_corners=False).numpy()


def smooth_volume(rng, shape):
    from scipy.ndimage import gaussian_filter
    v = rng.normal(size=shape).astype(np.float32)
    return gaussian_filter(v, sigma=1.5).astype(np.float32)


class TestGridSample:
    def test_trilinear_matches_torch(self, rng):
        vol = smooth_volume(rng, (2, 3, 12, 14, 16))
        theta = random_theta(rng, 2)
        ours = np.asarray(grid_sample(jnp.asarray(vol), jnp.asarray(theta), (10, 11, 13)))
        ref = torch_grid_sample(vol, theta, (10, 11, 13), 'bilinear')
        np.testing.assert_allclose(ours, ref, atol=2e-5)

    def test_nearest_matches_torch(self, rng):
        vol = rng.integers(0, 5, size=(2, 1, 12, 14, 16)).astype(np.float32)
        theta = random_theta(rng, 2)
        ours = np.asarray(grid_sample(jnp.asarray(vol), jnp.asarray(theta), (9, 10, 11),
                                      mode='nearest'))
        ref = torch_grid_sample(vol, theta, (9, 10, 11), 'nearest')
        # allow a tiny mismatch fraction at rounding ties / borders
        mismatch = (ours != ref).mean()
        assert mismatch < 5e-3, f"nearest mismatch fraction {mismatch}"

    def test_identity_roundtrip(self, rng):
        vol = smooth_volume(rng, (1, 2, 8, 8, 8))
        theta = np.eye(4, dtype=np.float32)[None]
        out = np.asarray(grid_sample(jnp.asarray(vol), jnp.asarray(theta), (8, 8, 8)))
        np.testing.assert_allclose(out, vol, atol=1e-6)

    def test_cell_boundary_coordinates_match_torch(self):
        """Regression: when a sample lands exactly on a cell boundary
        (i == k - eps), XLA used to duplicate the coordinate arithmetic into
        the index and weight fusions with different FMA contraction, putting
        the ~1 weight on the wrong corner — whole output planes came out one
        voxel off under jit. Coordinate-coded volume makes any corner mixup a
        large error (smooth volumes hide it)."""
        D, H, W = 24, 32, 48
        z, y, x = np.meshgrid(np.arange(D), np.arange(H), np.arange(W),
                              indexing='ij')
        vol = (z * 10000 + y * 100 + x).astype(np.float32)[None, None]
        t = np.eye(4, dtype=np.float32)
        t[0, 3] = 1.2   # large x translation; y/z land exactly on voxel centers
        ours = np.asarray(grid_sample(jnp.asarray(vol), jnp.asarray(t[None]),
                                      (D, H, W)))
        ref = torch_grid_sample(vol, t[None], (D, H, W), 'bilinear')
        in_bounds = ref != 0
        np.testing.assert_allclose(ours[in_bounds], ref[in_bounds], rtol=1e-6)

    def test_grad_flows_through_theta(self, rng):
        import jax
        vol = jnp.asarray(smooth_volume(rng, (1, 1, 8, 8, 8)))
        theta = jnp.asarray(random_theta(rng, 1))

        def f(th):
            return grid_sample(vol, th, (4, 4, 4)).sum()

        g = jax.grad(f)(theta)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0


class TestSliceIntoVolume:
    def test_matches_explicit_embedding(self, rng):
        S = 10
        slices = smooth_volume(rng, (2, 3, S, S))
        theta = random_theta(rng, 2)
        ours = np.asarray(sample_slice_into_volume(
            jnp.asarray(slices), jnp.asarray(theta), S))

        vol = np.zeros((2, 3, S, S, S), np.float32)
        vol[..., S // 2] = slices
        ref = torch_grid_sample(vol, theta, (S, S, S), 'bilinear')
        np.testing.assert_allclose(ours, ref, atol=2e-5)


class TestNiftiGridSample:
    def make_nii_affine(self, rng, b):
        aff = []
        for _ in range(b):
            a = np.eye(4)
            q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
            a[:3, :3] = q @ np.diag(rng.uniform(0.8, 2.0, size=3))
            a[:3, 3] = rng.uniform(-40, 40, size=3)
            aff.append(a)
        return np.stack(aff).astype(np.float32)

    @pytest.mark.skipif(not reference_available(), reason="reference not mounted")
    def test_parity_with_reference(self, rng):
        ref_nifti = import_reference_module("acquisition_focus.utils.nifti_utils")
        vol = smooth_volume(rng, (2, 2, 12, 14, 16))
        nii = self.make_nii_affine(rng, 2)
        pre = random_theta(rng, 2)
        fov_mm = np.array([20.0, 22.0, 18.0])
        fov_vox = (10, 11, 12)

        ours, ours_grid, ours_nii = nifti_grid_sample(
            jnp.asarray(vol), jnp.asarray(nii), jnp.asarray(fov_mm), fov_vox,
            is_label=False, pre_grid_sample_affine=jnp.asarray(pre))

        t_out, t_grid, t_nii = ref_nifti.nifti_grid_sample(
            torch.as_tensor(vol), torch.as_tensor(nii).double(),
            target_fov_mm=torch.as_tensor(fov_mm), target_fov_vox=torch.as_tensor(fov_vox),
            is_label=False, pre_grid_sample_affine=torch.as_tensor(pre).double())

        np.testing.assert_allclose(np.asarray(ours_grid), t_grid.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(ours_nii), t_nii.numpy(), atol=1e-3)
        np.testing.assert_allclose(np.asarray(ours), t_out.numpy(), atol=1e-3)

    @pytest.mark.skipif(not reference_available(), reason="reference not mounted")
    def test_label_parity_with_reference(self, rng):
        ref_nifti = import_reference_module("acquisition_focus.utils.nifti_utils")
        lbl = rng.integers(0, 6, size=(1, 1, 16, 16, 16)).astype(np.float32)
        nii = self.make_nii_affine(rng, 1)
        pre = random_theta(rng, 1)

        ours, _, _ = nifti_grid_sample(
            jnp.asarray(lbl), jnp.asarray(nii), None, None,
            is_label=True, pre_grid_sample_affine=jnp.asarray(pre))
        t_out, _, _ = ref_nifti.nifti_grid_sample(
            torch.as_tensor(lbl), torch.as_tensor(nii).double(),
            is_label=True, pre_grid_sample_affine=torch.as_tensor(pre).double())

        mismatch = (np.asarray(ours) != t_out.numpy()).mean()
        assert mismatch < 1e-2, f"label mismatch fraction {mismatch}"

    def test_output_affine_preserves_physical_geometry(self, rng):
        # Re-sampling with an identity pre-affine to the same FOV must reproduce the
        # volume; the output affine follows the reference's convention of a fixed
        # half-voxel translation offset (nifti_utils.py:67-70 — verified against the
        # upstream implementation on an identity resample).
        vol = smooth_volume(rng, (1, 1, 10, 10, 10))
        nii = self.make_nii_affine(rng, 1)
        out, _, out_nii = nifti_grid_sample(jnp.asarray(vol), jnp.asarray(nii))
        np.testing.assert_allclose(np.asarray(out)[0], vol[0], atol=1e-4)
        expected = nii.copy()
        expected[:, :3, 3] += (nii[:, :3, :3] @ np.full((3, 1), 0.5))[..., 0]
        np.testing.assert_allclose(np.asarray(out_nii), expected, atol=1e-4)

    def test_zooms_match_target_fov(self, rng):
        vol = smooth_volume(rng, (1, 1, 10, 12, 14))
        nii = self.make_nii_affine(rng, 1)
        fov_mm = np.array([30.0, 30.0, 30.0])
        fov_vox = (15, 15, 15)
        _, _, out_nii = nifti_grid_sample(jnp.asarray(vol), jnp.asarray(nii),
                                          jnp.asarray(fov_mm), fov_vox)
        zooms = np.asarray(affine_zooms(out_nii))[0]
        np.testing.assert_allclose(zooms, fov_mm / np.array(fov_vox), atol=1e-4)


class TestCrop:
    def test_crop_centers_label(self, rng):
        lbl = np.zeros((1, 1, 24, 24, 24), np.float32)
        lbl[0, 0, 14:20, 6:12, 10:16] = 1.0
        nii = np.eye(4, dtype=np.float32)[None]
        cropped, _, _ = crop_around_label_center(
            jnp.asarray(lbl), jnp.asarray(nii), jnp.asarray([8.0, 8.0, 8.0]), (8, 8, 8))
        c = np.asarray(cropped)[0, 0]
        assert c.sum() > 0
        # foreground mass center should be near the crop center
        idx = np.argwhere(c > 0)
        center = idx.mean(0)
        np.testing.assert_allclose(center, [3.5, 3.5, 3.5], atol=1.0)
