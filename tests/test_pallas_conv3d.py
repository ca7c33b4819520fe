"""Pallas direct 3D conv: forward parity vs lax.conv_general_dilated
(interpret mode on CPU; the real Mosaic compile is exercised on TPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import acquisition_focus_tpu.ops.pallas.conv3d as c3


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp_call(*a, **k):
        k['interpret'] = True
        return orig(*a, **k)

    monkeypatch.setattr(c3.pl, 'pallas_call', interp_call)


def xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), 'SAME',
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))


@pytest.mark.slow
class TestConv3dPallas:
    def test_forward_parity_f32(self, rng):
        B, D, H, W, Ci, Co = 1, 8, 8, 128, 5, 7
        x = jnp.asarray(rng.normal(size=(B, D, H, W, Ci)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, Ci, Co)) * 0.2, jnp.float32)
        ref = xla_conv(x, w)
        out = c3.conv3d_pallas(x, w)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_forward_parity_multibatch(self, rng):
        B, D, H, W, Ci, Co = 2, 16, 8, 128, 3, 4
        x = jnp.asarray(rng.normal(size=(B, D, H, W, Ci)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, Ci, Co)) * 0.2, jnp.float32)
        ref = xla_conv(x, w)
        out = c3.conv3d_pallas(x, w)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_forward_parity_bf16(self, rng):
        B, D, H, W, Ci, Co = 1, 8, 8, 128, 4, 6
        xf = rng.normal(size=(B, D, H, W, Ci)).astype(np.float32)
        wf = (rng.normal(size=(3, 3, 3, Ci, Co)) * 0.2).astype(np.float32)
        x = jnp.asarray(xf, jnp.bfloat16)
        w = jnp.asarray(wf, jnp.float32)
        ref = xla_conv(x, w.astype(jnp.bfloat16))
        out = c3.conv3d_pallas(x, w)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=0.35, rtol=0.05)

    def test_supports_guard(self):
        assert c3.supports_conv3d((2, 128, 128, 128, 96), (3, 3, 3, 96, 48))
        assert not c3.supports_conv3d((2, 128, 128, 96, 96), (3, 3, 3, 96, 48))
        assert not c3.supports_conv3d((2, 12, 128, 128, 96), (3, 3, 3, 96, 48))
        assert not c3.supports_conv3d((2, 128, 128, 128, 96), (5, 5, 5, 96, 48))
