"""Unrolled channel-axis reductions: exact parity with the jnp/jax.nn ops
(these replace pathological axis-1 reduces on TPU — see PERF.md)."""

import numpy as np
import jax
import jax.numpy as jnp

from acquisition_focus_tpu.ops.channel_ops import (
    channel_argmax, channel_log_softmax, channel_max, channel_softmax,
    channel_sum)


def test_softmax_logsoftmax_sum_max_parity(rng):
    x = jnp.asarray(rng.normal(size=(2, 6, 7, 5, 3)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(channel_softmax(x)), np.asarray(jax.nn.softmax(x, axis=1)),
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(channel_log_softmax(x)),
        np.asarray(jax.nn.log_softmax(x, axis=1)), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(channel_sum(x)), np.asarray(x.sum(axis=1, keepdims=True)),
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(channel_max(x)), np.asarray(x.max(axis=1, keepdims=True)),
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(channel_sum(x, keepdims=False)), np.asarray(x.sum(axis=1)),
        atol=1e-6)


def test_argmax_first_max_wins_with_ties(rng):
    x = jnp.asarray(np.round(rng.normal(size=(2, 6, 9, 4)) * 2) / 2, jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(channel_argmax(x)), np.asarray(jnp.argmax(x, axis=1)))


def test_grad_flows(rng):
    x = jnp.asarray(rng.normal(size=(1, 4, 5)), jnp.float32)
    g = jax.grad(lambda v: channel_log_softmax(v).sum())(x)
    g2 = jax.grad(lambda v: jax.nn.log_softmax(v, axis=1).sum())(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g2), atol=1e-6)
