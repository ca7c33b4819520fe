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


@pytest.mark.slow
class TestConv3dCustomVjp:
    def test_grads_match_xla(self, rng):
        # interpret fixture applies: the Pallas forward runs interpreted on CPU
        B, D, H, W, Ci, Co = 1, 8, 8, 128, 5, 7
        x = jnp.asarray(rng.normal(size=(B, D, H, W, Ci)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, Ci, Co)) * 0.2, jnp.float32)
        cot = jnp.asarray(rng.normal(size=(B, D, H, W, Co)), jnp.float32)

        def loss(conv, x_, w_):
            return (conv(x_, w_) * cot).sum()

        gx_p, gw_p = jax.grad(lambda a, b: loss(c3.conv3d, a, b), (0, 1))(x, w)
        gx_r, gw_r = jax.grad(lambda a, b: loss(xla_conv, a, b), (0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                                   atol=1e-3, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r),
                                   atol=1e-3, rtol=1e-4)


class TestConv3x3x3Module:
    def test_drop_in_matches_nn_conv(self, rng):
        """Same param tree (names+shapes) and identical outputs as nn.Conv on
        the non-Pallas path — checkpoint compatibility of the swap."""
        import flax.linen as nn
        from acquisition_focus_tpu.models.hybrid_unet import Conv3x3x3

        x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 5)), jnp.float32)
        key = jax.random.PRNGKey(0)
        ours = Conv3x3x3(6, dtype=jnp.float32, use_pallas=True, name='c')
        ref = nn.Conv(6, (3, 3, 3), padding='SAME', dtype=jnp.float32, name='c')
        p1 = ours.init(key, x)
        p2 = ref.init(key, x)
        assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p2)
        for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_allclose(np.asarray(ours.apply(p1, x)),
                                   np.asarray(ref.apply(p2, x)),
                                   atol=2e-6, rtol=1e-6)


@pytest.mark.slow
class TestConv3dWgrad:
    def test_wgrad_parity(self, rng):
        B, D, H, W, Ci, Co = 2, 8, 8, 128, 5, 7
        x = jnp.asarray(rng.normal(size=(B, D, H, W, Ci)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, Ci, Co)) * 0.2, jnp.float32)
        g = jnp.asarray(rng.normal(size=(B, D, H, W, Co)), jnp.float32)
        ref = jax.grad(lambda w_: (xla_conv(x, w_) * g).sum())(w)
        out = c3.conv3d_wgrad_pallas(x, g)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-3, rtol=1e-4)

    def test_wg_grads_match_xla(self, rng):
        """conv3d_wg: Pallas fwd + Pallas wgrad, XLA input grad."""
        B, D, H, W, Ci, Co = 1, 8, 8, 128, 5, 7
        x = jnp.asarray(rng.normal(size=(B, D, H, W, Ci)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, Ci, Co)) * 0.2, jnp.float32)
        cot = jnp.asarray(rng.normal(size=(B, D, H, W, Co)), jnp.float32)

        gx_p, gw_p = jax.grad(
            lambda a, b: (c3.conv3d_wg(a, b) * cot).sum(), (0, 1))(x, w)
        gx_r, gw_r = jax.grad(
            lambda a, b: (xla_conv(a, b) * cot).sum(), (0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                                   atol=5e-3, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r),
                                   atol=5e-3, rtol=1e-4)

    def test_dx_grads_match_xla(self, rng):
        """conv3d_dx: Pallas fwd + Pallas input grad, XLA weight grad."""
        B, D, H, W, Ci, Co = 1, 8, 8, 128, 5, 7
        x = jnp.asarray(rng.normal(size=(B, D, H, W, Ci)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, Ci, Co)) * 0.2, jnp.float32)
        cot = jnp.asarray(rng.normal(size=(B, D, H, W, Co)), jnp.float32)

        gx_p, gw_p = jax.grad(
            lambda a, b: (c3.conv3d_dx(a, b) * cot).sum(), (0, 1))(x, w)
        gx_r, gw_r = jax.grad(
            lambda a, b: (xla_conv(a, b) * cot).sum(), (0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                                   atol=5e-3, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r),
                                   atol=5e-3, rtol=1e-4)

    def test_pg_grads_match_xla(self, rng):
        B, D, H, W, Ci, Co = 1, 8, 8, 128, 5, 7
        x = jnp.asarray(rng.normal(size=(B, D, H, W, Ci)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, Ci, Co)) * 0.2, jnp.float32)
        cot = jnp.asarray(rng.normal(size=(B, D, H, W, Co)), jnp.float32)

        gx_p, gw_p = jax.grad(
            lambda a, b: (c3.conv3d_pg(a, b) * cot).sum(), (0, 1))(x, w)
        gx_r, gw_r = jax.grad(
            lambda a, b: (xla_conv(a, b) * cot).sum(), (0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                                   atol=5e-3, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r),
                                   atol=5e-3, rtol=1e-4)
