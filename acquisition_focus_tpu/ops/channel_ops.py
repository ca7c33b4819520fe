"""Unrolled channel-axis (axis=1) reductions for (B, C, *spatial) tensors.

XLA:TPU lowers reductions over the strided channel axis of a large
channels-second tensor (softmax/argmax over (B, 6, 128^3)) pathologically:
70-120 ms per reduce on a v5e where the equivalent elementwise formulation
takes ~4 ms (measured via device trace — see PERF.md). With small static C we
unroll the reduce into C-1 fused elementwise passes over contiguous
(B, *spatial) channel slices instead.

Semantics match the jnp/jax.nn equivalents exactly (argmax: first max wins).
"""

import jax.numpy as jnp


def channel_max(x, keepdims=True):
    """max over axis 1, unrolled."""
    m = x[:, 0]
    for c in range(1, x.shape[1]):
        m = jnp.maximum(m, x[:, c])
    return m[:, None] if keepdims else m


def channel_sum(x, keepdims=True):
    """sum over axis 1, unrolled."""
    s = x[:, 0]
    for c in range(1, x.shape[1]):
        s = s + x[:, c]
    return s[:, None] if keepdims else s


def channel_softmax(x):
    """softmax over axis 1 (numerically stabilized), unrolled reductions."""
    e = jnp.exp(x - channel_max(x))
    return e / channel_sum(e)


def channel_log_softmax(x):
    """log_softmax over axis 1, unrolled reductions."""
    y = x - channel_max(x)
    return y - jnp.log(channel_sum(jnp.exp(y)))


def channel_argmax(x):
    """argmax over axis 1 (first max wins, like jnp.argmax), int32."""
    m = x[:, 0]
    idx = jnp.zeros(m.shape, jnp.int32)
    for c in range(1, x.shape[1]):
        better = x[:, c] > m
        m = jnp.where(better, x[:, c], m)
        idx = jnp.where(better, c, idx)
    return idx
