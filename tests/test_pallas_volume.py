"""Pallas forward-only volume resample: parity vs the XLA gather formulation
(interpret mode on CPU; the real Mosaic compile is exercised on TPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import acquisition_focus_tpu.ops.pallas.volume_resample as vr
from acquisition_focus_tpu.ops.resample import grid_sample

# smallest supported source volume: (D, H, W) >= (BZ, BY, BX) = (20, 32, 48)
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

    def test_supports_guard(self):
        assert vr.supports_affine_volume_resample((128, 128, 128), (128,) * 3, 6)
        assert vr.supports_affine_volume_resample(DHW, (8, 8, 8), 6)
        assert not vr.supports_affine_volume_resample((16, 32, 48), (32,) * 3, 6)
        assert not vr.supports_affine_volume_resample(
            (128, 128, 128), (130,) * 3, 6)
        assert not vr.supports_affine_volume_resample(
            (128, 128, 128), (128,) * 3, 12)
