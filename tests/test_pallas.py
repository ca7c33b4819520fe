"""Pallas plane-resample kernel: forward + custom VJP parity vs the XLA op
(interpret mode on CPU; the real Mosaic compile is exercised on TPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import acquisition_focus_tpu.ops.pallas.plane_resample as pr
from acquisition_focus_tpu.ops.resample import sample_slice_into_volume


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp_call(*a, **k):
        k['interpret'] = True
        return orig(*a, **k)

    monkeypatch.setattr(pr.pl, 'pallas_call', interp_call)


def random_inputs(rng, B, C, S):
    slices = jnp.asarray(rng.normal(size=(B, C, S, S)), jnp.float32)
    thetas = []
    for _ in range(B):
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        t = np.eye(4)
        t[:3, :3] = q
        t[:3, 3] = rng.uniform(-0.2, 0.2, 3)
        thetas.append(t)
    return slices, jnp.asarray(np.stack(thetas), jnp.float32)


class TestPlaneResamplePallas:
    @pytest.mark.parametrize('S,C', [(8, 4), (16, 3)])
    def test_forward_parity(self, rng, S, C):
        slices, theta = random_inputs(rng, 2, C, S)
        ref = sample_slice_into_volume(slices, theta, S)
        out = pr.plane_resample_pallas(slices, theta, S)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_vjp_parity(self, rng):
        S, C, B = 16, 3, 2
        slices, theta = random_inputs(rng, B, C, S)
        g = jnp.asarray(rng.normal(size=(B, C, S, S, S)), jnp.float32)

        def loss_ref(s, th):
            return (sample_slice_into_volume(s, th, S) * g).sum()

        def loss_pal(s, th):
            return (pr.plane_resample_pallas(s, th, S) * g).sum()

        gr = jax.grad(loss_ref, argnums=(0, 1))(slices, theta)
        gp = jax.grad(loss_pal, argnums=(0, 1))(slices, theta)
        for r, p in zip(gr, gp):
            scale = max(float(jnp.abs(r).max()), 1e-6)
            np.testing.assert_allclose(np.asarray(p) / scale, np.asarray(r) / scale,
                                       atol=1e-4)

    def test_fast_mode_close_to_exact(self, rng):
        """bf16 contraction mode: values/grads within bf16 rounding of exact."""
        S, C, B = 16, 3, 2
        slices, theta = random_inputs(rng, B, C, S)
        out = pr.plane_resample_pallas(slices, theta, S, True)
        ref = pr.plane_resample_pallas(slices, theta, S)
        scale = max(float(jnp.abs(ref).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(out) / scale,
                                   np.asarray(ref) / scale, atol=2e-2)

        def loss(s, fast):
            return (pr.plane_resample_pallas(s, theta, S, fast)
                    .astype(jnp.float32) ** 2).sum()

        gf = jax.grad(lambda s: loss(s, True))(slices)
        ge = jax.grad(lambda s: loss(s, False))(slices)
        gs = max(float(jnp.abs(ge).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(gf) / gs, np.asarray(ge) / gs,
                                   atol=2e-2)

    def test_identity_affine_center_plane(self, rng):
        S, C = 8, 2
        slices = jnp.asarray(rng.normal(size=(1, C, S, S)), jnp.float32)
        theta = jnp.broadcast_to(jnp.eye(4), (1, 4, 4)).astype(jnp.float32)
        out = np.asarray(pr.plane_resample_pallas(slices, theta, S))
        assert np.abs(out[0, :, :, :, S // 2]).sum() > 0
        np.testing.assert_allclose(out[0, :, :, :, 0], 0.0, atol=1e-6)
