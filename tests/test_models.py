"""Model stack tests: ATM theta heads, stacked ATMs, hybrid U-Net forward/backward."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from acquisition_focus_tpu.models.atm import (
    StackedATMs, atm_theta_from_heads, vox_range_for_clip)
from acquisition_focus_tpu.models.hybrid_unet import HybridUnet


class TestThetaHeads:
    def test_vox_range(self):
        assert vox_range_for_clip(0.2, 128) == 26
        assert vox_range_for_clip(1.0, 128) == 128
        assert vox_range_for_clip(0.0, 128) == 0

    def test_zero_head_gives_identity(self):
        spat = 32
        vox_range = vox_range_for_clip(0.2, spat)
        head = jnp.zeros((2, 6 + 3 * vox_range + 1))
        theta = atm_theta_from_heads(head, 'R6-vector', spat, 0.2, 0.0)
        np.testing.assert_allclose(np.asarray(theta),
                                   np.broadcast_to(np.eye(4), (2, 4, 4)), atol=1e-5)

    def test_offsets_respect_clip(self, rng):
        spat = 32
        vox_range = vox_range_for_clip(0.3, spat)
        head = jnp.asarray(rng.normal(scale=50.0, size=(4, 6 + 3 * vox_range + 1)),
                           jnp.float32)
        theta = atm_theta_from_heads(head, 'R6-vector', spat, 0.3, 0.0)
        offsets = np.asarray(theta)[:, :3, 3]
        assert np.abs(offsets).max() <= 0.3 + 2.0 / spat

    def test_zoom_clip(self, rng):
        spat = 16
        vox_range = vox_range_for_clip(0.2, spat)
        head = jnp.asarray(rng.normal(scale=10.0, size=(4, 6 + 3 * vox_range + 1)),
                           jnp.float32)
        theta = atm_theta_from_heads(head, 'R6-vector', spat, 0.2, 0.5)
        # column norms = zoom factor in [0.5, 1.5]
        zooms = np.linalg.norm(np.asarray(theta)[:, :3, :3], axis=1)
        assert (zooms > 0.49).all() and (zooms < 1.51).all()


@pytest.mark.slow
class TestStackedATMs:
    def test_shapes_and_grouping(self, rng):
        V, B, S, C = 3, 2, 32, 6
        model = StackedATMs(n_views=V, prescan_spat=S, offset_clip_value=0.2)
        x = jnp.asarray(rng.normal(size=(V, B, S, S, S, C)), jnp.float32)
        params = model.init(jax.random.key(0), x)
        thetas = model.apply(params, x)
        assert thetas.shape == (V, B, 4, 4)
        np.testing.assert_allclose(np.asarray(thetas)[..., 3, :],
                                   np.broadcast_to([0, 0, 0, 1], (V, B, 4)), atol=1e-6)
        # per-view parameters are independent: leading axis V on every leaf
        leaves = jax.tree_util.tree_leaves(params)
        assert all(leaf.shape[0] == V for leaf in leaves)

    def test_views_differ(self, rng):
        V, B, S, C = 2, 1, 32, 3
        model = StackedATMs(n_views=V, prescan_spat=S)
        x = jnp.asarray(np.repeat(rng.normal(size=(1, B, S, S, S, C)), V, 0), jnp.float32)
        params = model.init(jax.random.key(1), x)
        thetas = np.asarray(model.apply(params, x))
        # same input, different per-view params -> different predictions
        assert np.abs(thetas[0] - thetas[1]).max() > 1e-4

    def test_per_view_loop_matches_vmap_module(self, rng):
        """apply_stacked_atms (per-view loop + hoisted s2d blocking + remat
        policy) computes the same thetas as the StackedATMs vmap module."""
        from acquisition_focus_tpu.models.atm import apply_stacked_atms
        V, B, S, C = 2, 1, 16, 3
        model = StackedATMs(n_views=V, prescan_spat=S, locnet_width=4)
        x = jnp.asarray(rng.normal(size=(V, B, S, S, S, C)), jnp.float32)
        params = model.init(jax.random.key(2), x)
        ref = model.apply(params, x)
        out = apply_stacked_atms(
            params, x, optim_method='R6-vector', prescan_spat=S,
            offset_clip_value=0.2, zoom_clip_value=0.0, locnet_width=4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_train_mask_structurally_prunes_frozen_backward(self, rng):
        """train_mask=[F,F,T]: (a) thetas identical to the unmasked apply,
        (b) grads of frozen views' params are exact zeros, (c) the traced
        gradient computation contains FEWER conv ops than without the mask —
        the frozen views' locnet backward is pruned at trace level, not merely
        zeroed at runtime (the perf point of the mask)."""
        from acquisition_focus_tpu.models.atm import apply_stacked_atms
        V, B, S, C = 3, 1, 16, 3
        model = StackedATMs(n_views=V, prescan_spat=S, locnet_width=4)
        x = jnp.asarray(rng.normal(size=(V, B, S, S, S, C)), jnp.float32)
        params = model.init(jax.random.key(3), x)
        kw = dict(optim_method='R6-vector', prescan_spat=S,
                  offset_clip_value=0.2, zoom_clip_value=0.0, locnet_width=4)
        mask = np.array([False, False, True])

        out_masked = apply_stacked_atms(params, x, train_mask=mask, **kw)
        out_plain = apply_stacked_atms(params, x, **kw)
        np.testing.assert_allclose(np.asarray(out_masked), np.asarray(out_plain),
                                   atol=0, rtol=0)

        def loss(p, m):
            return (apply_stacked_atms(p, x, train_mask=m, **kw) ** 2).sum()

        grads = jax.grad(loss)(params, mask)
        live = 0.0
        for leaf in jax.tree_util.tree_leaves(grads):
            g = np.asarray(leaf)
            assert (g[:2] == 0).all()          # frozen views: exact zeros
            live += np.abs(g[2]).sum()
        assert live > 0                        # trainable view: live grads
        # (per-leaf zeros are legitimate for the trainable view too: with
        # zoom_clip_value=0 the zoom head's grads vanish identically)

        def count_convs(m):
            jaxpr = jax.make_jaxpr(jax.grad(lambda p: loss(p, m)))(params)
            return str(jaxpr).count('conv_general_dilated')

        assert count_convs(mask) < count_convs(None)


@pytest.mark.slow
class TestHybridUnet:
    def test_forward_backward(self, rng):
        V, C, S, B = 2, 3, 32, 1
        model = HybridUnet(n_views=V, num_classes=C, remat_skips=True)
        x = jnp.asarray(rng.normal(size=(B, V * C, S, S)), jnp.float32)
        affs = jnp.broadcast_to(jnp.eye(4), (V, B, 4, 4)).astype(jnp.float32)
        params = model.init(jax.random.key(0), x, affs)
        out = model.apply(params, x, affs)
        assert out.shape == (B, C, S, S, S)

        def loss(p, a):
            return (model.apply(p, x, a) ** 2).mean()

        grads, ga_grads = jax.grad(loss, argnums=(0, 1))(params, affs)
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)
        assert np.abs(np.asarray(ga_grads)).sum() > 0  # grads reach the view affines

    def test_skip_reembedding_places_content_on_plane(self, rng):
        # identity affine: slice content must land on the center W-plane of the volume
        from acquisition_focus_tpu.models.hybrid_unet import SkipConnector
        V, S, f = 1, 8, 2
        x = jnp.asarray(rng.normal(size=(1, S, S, V * f)), jnp.float32)
        aff = jnp.broadcast_to(jnp.eye(4), (V, 1, 4, 4)).astype(jnp.float32)
        mod = SkipConnector(V)
        out = mod.apply({}, x, aff)
        assert out.shape == (1, S, S, S, f)
        out = np.asarray(out)
        assert np.abs(out[0, :, :, S // 2]).sum() > 0
        np.testing.assert_allclose(out[0, :, :, 0], 0.0, atol=1e-6)
