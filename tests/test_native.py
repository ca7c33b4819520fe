"""Native C++ resampler: parity vs the JAX op."""

import numpy as np
import pytest
import jax.numpy as jnp

from acquisition_focus_tpu.data import native
from acquisition_focus_tpu.ops.resample import grid_sample

native.ensure_built()  # builds with the host g++ when absent; skip only if that fails


@pytest.mark.skipif(not native.is_available(),
                    reason="native lib not built and no host compiler")
class TestNativeResample:
    def test_trilinear_parity(self, rng):
        vol = rng.random((3, 10, 12, 14)).astype(np.float32)
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        theta = np.eye(4)
        theta[:3, :3] = q * 1.1
        theta[:3, 3] = rng.uniform(-0.2, 0.2, 3)
        out = native.native_grid_sample(vol, theta, (8, 9, 10))
        ref = np.asarray(grid_sample(jnp.asarray(vol)[None],
                                     jnp.asarray(theta, jnp.float32)[None],
                                     (8, 9, 10)))[0]
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_nearest_parity(self, rng):
        vol = rng.integers(0, 5, (1, 10, 10, 10)).astype(np.float32)
        theta = np.eye(4)
        theta[:3, 3] = [0.113, -0.057, 0.209]  # avoid exact .5-voxel ties (f32 vs f64)
        out = native.native_grid_sample(vol, theta, (10, 10, 10), mode='nearest')
        ref = np.asarray(grid_sample(jnp.asarray(vol)[None],
                                     jnp.asarray(theta, jnp.float32)[None],
                                     (10, 10, 10), mode='nearest'))[0]
        mismatch = (out != ref).mean()
        assert mismatch < 5e-3

    def test_label_center(self):
        lbl = np.zeros((8, 8, 8), np.int32)
        lbl[2:4, 3:5, 4:6] = 1
        c = native.native_label_center(lbl)
        np.testing.assert_allclose(c, [2.5, 3.5, 4.5])

    def test_resample_iso_native_matches_jax(self, rng, monkeypatch):
        """The wired production caller (preprocess.resample_iso) produces the
        same volume and output affine through the native and JAX paths."""
        from acquisition_focus_tpu.data import preprocess

        data = rng.random((12, 14, 10)).astype(np.float32) + 3.0
        aff = np.diag([1.7, 1.3, 2.1, 1.0])
        aff[:3, 3] = [4.0, -2.0, 1.0]

        out_nat, aff_nat = preprocess.resample_iso(data, aff, spacing_mm=1.0)
        monkeypatch.setattr(native, 'is_available', lambda: False)
        out_jax, aff_jax = preprocess.resample_iso(data, aff, spacing_mm=1.0)

        assert out_nat.shape == out_jax.shape
        np.testing.assert_allclose(aff_nat, aff_jax, atol=1e-5)
        np.testing.assert_allclose(out_nat, out_jax, atol=2e-4)
