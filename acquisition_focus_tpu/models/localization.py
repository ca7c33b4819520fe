"""Localization CNN predicting view-affine parameters from a prescan volume.

flax re-design of the reference's 10-layer 3D ConvNet + FC head
(/root/reference/acquisition_focus/models/learnable_transform.py:13-60):
5x5x5 convs, instance norm (no affine), LeakyReLU, 4x average pooling, a 1x1x1
collapse to a single channel, then a dense head. Channels-last layout for TPU convs.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name


def instance_norm_stateless(x, eps=1e-5):
    """Param-free instance norm as plain fused ops: GroupNorm's group reshape makes
    XLA materialize multi-GB padded copies in the backward at 128^3 (PERF.md)."""
    axes = tuple(range(1, x.ndim - 1))
    xf = x.astype(jnp.float32)
    mean = xf.mean(axes, keepdims=True)
    var = xf.var(axes, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def instance_norm(x, use_scale=False, use_bias=False, name=None, dtype=None):
    """InstanceNorm == GroupNorm with one channel per group (no running stats, which
    matches torch InstanceNorm3d's default track_running_stats=False). ``dtype``
    sets the computation dtype (None = float32)."""
    return nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                        use_scale=use_scale, use_bias=use_bias, name=name,
                        dtype=dtype)(x)


class ConvNet(nn.Module):
    """Backbone: (B, D, H, W, C) -> (B, D/16, H/16, W/16, 1)."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        def block(x, features):
            # 'conv_out' names the (bf16) conv results for policy-based remat:
            # save these, recompute the f32 norm/activation in backward — the f32
            # norm intermediates otherwise dominate saved-activation HBM (measured
            # 21GB OOM at the default workload without any ATM remat)
            x = nn.Conv(features, (5, 5, 5), padding='SAME', dtype=self.dtype)(x)
            x = checkpoint_name(x, 'conv_out')
            x = instance_norm_stateless(x)
            return nn.leaky_relu(x, negative_slope=0.01)

        def pool(x):
            return nn.avg_pool(x, (2, 2, 2), strides=(2, 2, 2))

        x = pool(block(x, 32))
        x = pool(block(block(x, 64), 64))
        x = pool(block(block(x, 64), 64))
        x = pool(block(block(x, 64), 32))
        x = block(x, 32)
        x = nn.Conv(1, (1, 1, 1), dtype=self.dtype)(x)
        return instance_norm_stateless(x)


class LocalizationNet(nn.Module):
    """ConvNet backbone + dense head emitting ap_space + 3*vox_range + 1 params."""
    output_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = ConvNet(dtype=self.dtype)(x)
        h = h.reshape(h.shape[0], -1)
        return nn.Dense(self.output_size, dtype=jnp.float32)(h)
