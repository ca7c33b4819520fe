"""Pallas forward-only volume resample: parity vs the XLA gather formulation
(interpret mode on CPU; the real Mosaic compile is exercised on TPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import acquisition_focus_tpu.ops.pallas.volume_resample as vr
from acquisition_focus_tpu.ops.resample import grid_sample

# smallest source volume supporting BBOX_LARGE = (20, 32, 48) (and a fortiori
# BBOX_SMALL), so both cascade stages are exercised
DHW = (24, 32, 48)
OUT = (24, 32, 48)


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp_call(*a, **k):
        k['interpret'] = True
        return orig(*a, **k)

    monkeypatch.setattr(vr.pl, 'pallas_call', interp_call)


def rotation_theta(rng, scale=1.0, offset=0.15):
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    t = np.eye(4)
    t[:3, :3] = q * scale
    t[:3, 3] = rng.uniform(-offset, offset, 3)
    return t


def small_rotation_theta(rng, max_deg=15.0, scale=1.0, offset=0.1):
    """Rodrigues rotation by a bounded angle — the prescan-path regime."""
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    ang = np.deg2rad(rng.uniform(0.3, 1.0) * max_deg)
    k = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    r = np.eye(3) + np.sin(ang) * k + (1 - np.cos(ang)) * (k @ k)
    t = np.eye(4)
    t[:3, :3] = r * scale
    t[:3, 3] = rng.uniform(-offset, offset, 3)
    return t


class TestAffineVolumeResamplePallas:
    def test_identity(self, rng):
        B, C = 1, 3
        vol = jnp.asarray(rng.normal(size=(B, C) + DHW), jnp.float32)
        theta = jnp.broadcast_to(jnp.eye(4), (B, 4, 4)).astype(jnp.float32)
        out = vr.affine_volume_resample_pallas(vol, theta, OUT)
        np.testing.assert_allclose(np.asarray(out), np.asarray(vol), atol=1e-5)

    def test_rotation_parity_f32(self, rng):
        B, C = 2, 3
        vol = jnp.asarray(rng.normal(size=(B, C) + DHW), jnp.float32)
        theta = jnp.asarray(
            np.stack([rotation_theta(rng, scale=s) for s in (0.9, 1.2)]),
            jnp.float32)
        ref = grid_sample(vol, theta, OUT, mode='trilinear')
        out = vr.affine_volume_resample_pallas(vol, theta, OUT)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_rotation_parity_bf16(self, rng):
        B, C = 1, 6
        vol_f = rng.random((B, C) + DHW).astype(np.float32)
        vol = jnp.asarray(vol_f, jnp.bfloat16)
        theta = jnp.asarray(rotation_theta(rng)[None], jnp.float32)
        ref = grid_sample(vol, theta, OUT, mode='trilinear')
        out = vr.affine_volume_resample_pallas(vol, theta, OUT)
        # bf16 weights: ~1-2 output ulp vs the f32-weight gather path
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=0.03)

    def test_shared_volume_multi_affine(self, rng):
        """T = M*B affines share B volumes: row t samples volume t % B."""
        B, C = 2, 2
        vol = jnp.asarray(rng.normal(size=(B, C) + DHW), jnp.float32)
        theta = jnp.asarray(
            np.stack([rotation_theta(rng) for _ in range(4)]), jnp.float32)
        ref = grid_sample(vol, theta, OUT, mode='trilinear')
        out = vr.affine_volume_resample_pallas(vol, theta, OUT)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_out_of_bounds_zero_padding(self, rng):
        B, C = 1, 2
        vol = jnp.asarray(1.0 + rng.random((B, C) + DHW), jnp.float32)
        t = np.eye(4)
        t[:3, 3] = [1.2, 0.0, 0.0]   # shift the x sampling window mostly outside
        out = vr.affine_volume_resample_pallas(
            vol, jnp.asarray(t[None], jnp.float32), OUT)
        ref = grid_sample(vol, jnp.asarray(t[None], jnp.float32), OUT,
                          mode='trilinear')
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
        assert float(jnp.abs(out[..., -OUT[2] // 4:]).sum()) == 0.0

    def test_upsampled_output(self, rng):
        """Output grid denser than the source (zoom-in, scale < 1)."""
        B, C = 1, 3
        vol = jnp.asarray(rng.normal(size=(B, C) + DHW), jnp.float32)
        theta = jnp.asarray(rotation_theta(rng, scale=0.6)[None], jnp.float32)
        out_dhw = (32, 40, 64)
        ref = grid_sample(vol, theta, out_dhw, mode='trilinear')
        out = vr.affine_volume_resample_pallas(vol, theta, out_dhw)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_small_bbox_parity(self, rng):
        """The BBOX_SMALL variant (2.9x cheaper) is exact on the affines its
        scale guard admits — the prescan path's near-unit scales and small
        rotations."""
        B, C = 1, 4
        vol = jnp.asarray(rng.normal(size=(B, C) + DHW), jnp.float32)
        theta = jnp.asarray(
            small_rotation_theta(rng, max_deg=20.0, scale=1.05)[None],
            jnp.float32)
        assert bool(vr.kernel_scale_fits(theta, OUT, DHW, vr.BBOX_SMALL))
        ref = grid_sample(vol, theta, OUT, mode='trilinear')
        out = vr.affine_volume_resample_pallas(vol, theta, OUT, vr.BBOX_SMALL)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_bbox_guard_ordering(self, rng):
        """Guard monotonicity the cascade depends on: small-fits => large-fits;
        a scale beyond the small bound still fits large."""
        mild = jnp.asarray(
            small_rotation_theta(rng, max_deg=10.0, scale=1.0)[None],
            jnp.float32)
        assert bool(vr.kernel_scale_fits(mild, OUT, DHW, vr.BBOX_SMALL))
        assert bool(vr.kernel_scale_fits(mild, OUT, DHW, vr.BBOX_LARGE))
        # 45 deg about x at scale 1.35: row L1 = 1.414 * 1.35 => tile extent
        # 7 * 1.909 = 13.4 — beyond the small z bound (11), inside the large
        # bounds (z 17, y 22, x 30)
        wide = np.eye(4)
        c = s = np.sqrt(0.5) * 1.35
        wide[1, 1], wide[1, 2], wide[2, 1], wide[2, 2] = c, -s, s, c
        wide[0, 0] = 1.35
        wide = jnp.asarray(wide[None], jnp.float32)
        assert not bool(vr.kernel_scale_fits(wide, OUT, DHW, vr.BBOX_SMALL))
        assert bool(vr.kernel_scale_fits(wide, OUT, DHW, vr.BBOX_LARGE))

    def test_supports_guard(self):
        assert vr.supports_affine_volume_resample((128, 128, 128), (128,) * 3, 6)
        assert vr.supports_affine_volume_resample(DHW, (8, 8, 8), 6)
        assert not vr.supports_affine_volume_resample((16, 32, 48), (32,) * 3, 6)
        assert not vr.supports_affine_volume_resample(
            (128, 128, 128), (130,) * 3, 6)
        assert not vr.supports_affine_volume_resample(
            (128, 128, 128), (128,) * 3, 12)


class TestNodiffWrapperGlue:
    """The nifti_grid_sample_nodiff kernel path (min-value shift, nii/fov tiling,
    dtype handling, fov_mm default, runtime scale guard) driven on CPU via
    force_kernel=True + interpret mode — ADVICE r1: previously only the raw
    kernel and the gather fallback were tested, never the glue between them."""

    def _vol_nii(self, rng, B=1, C=2):
        from acquisition_focus_tpu.ops.resample import nifti_grid_sample
        vol = jnp.asarray(10.0 + rng.normal(size=(B, C) + DHW), jnp.float32)
        nii = np.eye(4)
        nii[:3, :3] *= 1.5   # 1.5 mm iso spacing
        nii = jnp.asarray(np.broadcast_to(nii, (B, 4, 4)), jnp.float32)
        return vol, nii, nifti_grid_sample

    def test_kernel_glue_matches_diff_path(self, rng):
        from acquisition_focus_tpu.ops.resample import nifti_grid_sample_nodiff
        vol, nii, nifti_grid_sample = self._vol_nii(rng)
        pre = jnp.asarray(rotation_theta(rng, scale=1.0, offset=0.05)[None],
                          jnp.float32)
        kw = dict(target_fov_mm=(36.0, 48.0, 72.0), target_fov_vox=OUT,
                  pre_grid_sample_affine=pre)
        ref, ref_aff, ref_nii = nifti_grid_sample(vol, nii, **kw)
        out, out_aff, out_nii = nifti_grid_sample_nodiff(
            vol, nii, force_kernel=True, **kw)
        np.testing.assert_allclose(np.asarray(out_aff), np.asarray(ref_aff),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(out_nii), np.asarray(ref_nii),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_kernel_glue_fov_mm_default(self, rng):
        """fov_mm=None must mean 'keep the physical extent' on the kernel path
        too (ADVICE r1: used to crash in grid_affines_for_fov)."""
        from acquisition_focus_tpu.ops.resample import nifti_grid_sample_nodiff
        vol, nii, nifti_grid_sample = self._vol_nii(rng)
        ref, _, _ = nifti_grid_sample(vol, nii, target_fov_vox=OUT)
        out, _, _ = nifti_grid_sample_nodiff(vol, nii, target_fov_vox=OUT,
                                             force_kernel=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_out_of_scale_affine_takes_gather_branch(self, rng):
        """A zoomed-out affine beyond the kernel's static bbox must route to the
        exact gather branch of the lax.cond (not silently clamp the bbox)."""
        from acquisition_focus_tpu.ops.resample import nifti_grid_sample_nodiff
        vol, nii, nifti_grid_sample = self._vol_nii(rng)
        # 2x the source extent per output voxel: far beyond the ~1.4 bbox bound
        kw = dict(target_fov_mm=(72.0, 96.0, 144.0), target_fov_vox=OUT)
        ref, _, _ = nifti_grid_sample(vol, nii, **kw)
        out, _, _ = nifti_grid_sample_nodiff(vol, nii, force_kernel=True, **kw)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_int_label_dtype_roundtrip(self, rng):
        from acquisition_focus_tpu.ops.resample import nifti_grid_sample_nodiff
        vol, nii, nifti_grid_sample = self._vol_nii(rng)
        ivol = jnp.asarray(np.asarray(vol) > 10.0, jnp.int32)
        kw = dict(target_fov_mm=(36.0, 48.0, 72.0), target_fov_vox=OUT)
        ref, _, _ = nifti_grid_sample(ivol, nii, is_label=True, **kw)
        out, _, _ = nifti_grid_sample_nodiff(ivol, nii, is_label=True,
                                             force_kernel=True, **kw)
        # is_label resamples run nearest-neighbor through the gather path on
        # both sides (the kernel never handles labels)
        assert out.dtype == ref.dtype == jnp.int32
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
