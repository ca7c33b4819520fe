"""Space-to-depth ConvNet execution: exact parity with the plain 5^3 conv path
(same parameter tree, same math, different blocking — see models/localization.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from acquisition_focus_tpu.models.localization import (
    ConvNet, S2dConv5, s2d_conv_weights, space_to_depth)


def test_s2d_conv_matches_plain_conv(rng):
    import flax.linen as nn
    B, S, Ci, Co = 2, 8, 3, 5
    x = jnp.asarray(rng.normal(size=(B, S, S, S, Ci)), jnp.float32)
    plain = nn.Conv(Co, (5, 5, 5), padding='SAME', name='Conv_0')
    params = plain.init(jax.random.key(0), x)
    ref = plain.apply(params, x)

    blocked = S2dConv5(Co, name='Conv_0')
    out_b = blocked.apply(params, space_to_depth(x))
    # un-block: (B, S/2, S/2, S/2, 8Co) -> (B, S, S, S, Co)
    d = S // 2
    out = out_b.reshape(B, d, d, d, 2, 2, 2, Co)
    out = jnp.transpose(out, (0, 1, 4, 2, 5, 3, 6, 7)).reshape(B, S, S, S, Co)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.slow
def test_s2d_param_tree_matches_plain(rng):
    x = jnp.zeros((1, 16, 16, 16, 3))
    p_plain = ConvNet(use_s2d=False).init(jax.random.key(0), x)
    p_s2d = ConvNet(use_s2d=True).init(jax.random.key(0), x)
    flat_a = jax.tree_util.tree_leaves_with_path(p_plain)
    flat_b = jax.tree_util.tree_leaves_with_path(p_s2d)
    assert [(jax.tree_util.keystr(k), v.shape) for k, v in flat_a] \
        == [(jax.tree_util.keystr(k), v.shape) for k, v in flat_b]
    # identical init values (per-param RNG is path-derived)
    for (_, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_convnet_s2d_full_parity(rng):
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 3)), jnp.float32)
    params = ConvNet(use_s2d=False).init(jax.random.key(0), x)
    ref = ConvNet(use_s2d=False).apply(params, x)
    out = ConvNet(use_s2d=True).apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_weight_rewrite_zero_taps(rng):
    """Blocked taps outside the 5^3 support must be exactly zero."""
    k = jnp.asarray(rng.normal(size=(5, 5, 5, 2, 3)), jnp.float32)
    w2 = np.asarray(s2d_conv_weights(k))
    assert w2.shape == (3, 3, 3, 16, 24)
    # energy check: the rewrite redistributes every original tap 8 times
    np.testing.assert_allclose(np.square(w2).sum(), 8 * np.square(k).sum(),
                               rtol=1e-5)
