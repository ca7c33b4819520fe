"""Localization CNN predicting view-affine parameters from a prescan volume.

flax re-design of the reference's 10-layer 3D ConvNet + FC head
(/root/reference/acquisition_focus/models/learnable_transform.py:13-60):
5x5x5 convs, instance norm (no affine), LeakyReLU, 4x average pooling, a 1x1x1
collapse to a single channel, then a dense head. Channels-last layout for TPU convs.

TPU execution detail: the large-volume stages (128^3 and 64^3) run in
**space-to-depth form** — an exact algebraic rewrite of each stride-1 5^3 conv
as a 3^3 conv over 2x2x2-blocked channels (8*Cin -> 8*Cout). The plain
formulation's tiny channel counts starve the MXU (the first conv's weight
gradient measured 2.3 TF/s, 87 ms per view per step); the blocked form has
MXU-shaped contractions. Parameters keep the reference 5^3 layout — the
blocked kernel is derived inside the forward — so checkpoints, init
distributions, and per-view masking are unchanged.
"""

import numpy as np
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


def space_to_depth(x):
    """(B, D, H, W, C) -> (B, D/2, H/2, W/2, 8C); blocked channel index is
    ((rd*2+rh)*2+rw)*C + c for intra-block offset r."""
    B, D, H, W, C = x.shape
    x = x.reshape(B, D // 2, 2, H // 2, 2, W // 2, 2, C)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4, 6, 7))
    return x.reshape(B, D // 2, H // 2, W // 2, 8 * C)


_S2D_TAP = None


def _s2d_tap_matrix():
    """(5, 12) one-hot scatter matrix: S[k, (m,s,r)] = 1 iff k == 2(m-1)+s-r+2."""
    global _S2D_TAP
    if _S2D_TAP is None:
        S = np.zeros((5, 3, 2, 2), np.float32)
        for k in range(5):
            for m in range(3):
                for s_ in range(2):
                    for r in range(2):
                        if 2 * (m - 1) + s_ - r + 2 == k:
                            S[k, m, s_, r] = 1.0
        _S2D_TAP = S.reshape(5, 12)
    return _S2D_TAP


def s2d_conv_weights(kernel):
    """Rewrite a stride-1 5^3 conv kernel (5,5,5,Ci,Co) as the equivalent 3^3
    conv over 2x2x2-blocked channels: (3,3,3,8Ci,8Co).

    y[2q+r] = sum_d W[d+2] x[2q+r+d]  with  r+d = 2m+s  gives
    W2[m+1, (s,ci), (r,co)] = W[2m+s-r+2] (zero outside [0,4]). The scatter is
    expressed as three one-hot tensordots — a per-element gather lowers to the
    TPU gather engine and cost ~150 ms/step across the views (measured)."""
    Ci, Co = kernel.shape[3], kernel.shape[4]
    S = jnp.asarray(_s2d_tap_matrix(), kernel.dtype)
    W2 = jnp.einsum('abcio,ax,by,cz->xyzio', kernel, S, S, S)  # (12,12,12,Ci,Co)
    W2 = W2.reshape(3, 2, 2, 3, 2, 2, 3, 2, 2, Ci, Co)
    # (md,sd,rd, mh,sh,rh, mw,sw,rw, Ci, Co) -> (md,mh,mw, sd,sh,sw,ci, rd,rh,rw,co)
    W2 = jnp.transpose(W2, (0, 3, 6, 1, 4, 7, 9, 2, 5, 8, 10))
    return W2.reshape(3, 3, 3, 8 * Ci, 8 * Co)


class S2dConv5(nn.Module):
    """5^3 stride-1 SAME conv executed in space-to-depth form.

    Parameters are identical to ``nn.Conv(features, (5,5,5))`` — same names
    ('kernel'/'bias'), shapes, and init distributions — so state dicts are
    interchangeable with the plain formulation."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xb):
        Ci = xb.shape[-1] // 8
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (5, 5, 5, Ci, self.features))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        w2 = s2d_conv_weights(kernel).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            xb.astype(self.dtype), w2, window_strides=(1, 1, 1),
            padding='SAME',
            dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
        return y + jnp.tile(bias, 8).astype(self.dtype)


def instance_norm_stateless_s2d(x, C, eps=1e-5):
    """instance_norm_stateless on a blocked (B, d, h, w, 8C) tensor: per-channel
    stats pool over space AND the 8 block offsets (== unblocked instance norm).

    Implemented WITHOUT reshaping the activation: spatial sums give (B, 8C)
    moments (tiny), which reduce over the 8 block offsets host-size and re-tile
    along the lane axis. The previous reshape-to-(B, -1, 8, C) formulation
    split the lane axis and forced f32 relayout copies of the whole tensor
    (~5.4 ms per 536 MB reshape, x3 views x fwd+remat — device trace, PERF.md
    round 3)."""
    B = x.shape[0]
    n = x.shape[1] * x.shape[2] * x.shape[3] * 8
    xf = x.astype(jnp.float32)
    mean_c = xf.sum(axis=(1, 2, 3)).reshape(B, 8, C).sum(axis=1) / n   # (B, C)
    mean8 = jnp.tile(mean_c, (1, 8))[:, None, None, None, :]  # lane idx r*C+c
    var_c = jnp.square(xf - mean8).sum(axis=(1, 2, 3)) \
        .reshape(B, 8, C).sum(axis=1) / n
    rstd8 = jnp.tile(jax.lax.rsqrt(var_c + eps), (1, 8))[:, None, None, None, :]
    return ((xf - mean8) * rstd8).astype(x.dtype)


def pool_from_s2d(x, C):
    """2x2x2/stride-2 average pool of the unblocked tensor == mean over the 8
    block offsets: (B, d, h, w, 8C) -> (B, d, h, w, C).

    Static lane slices + adds (one fused pass, f32 accumulation) instead of a
    reshape-to-(..., 8, C) mean, which split the lane axis and relayout-copied
    the whole tensor (device trace, PERF.md round 3)."""
    acc = x[..., :C].astype(jnp.float32)
    for r in range(1, 8):
        acc = acc + x[..., r * C:(r + 1) * C].astype(jnp.float32)
    return (acc / 8.0).astype(x.dtype)


class ConvNet(nn.Module):
    """Backbone: (B, D, H, W, C) -> (B, D/16, H/16, W/16, 1).

    use_s2d runs the 128^3/64^3 stages space-to-depth (exact rewrite, see module
    docstring); parameters are identical either way. ``width`` scales the channel
    plan (reference plan = width 32: 32, 64 x5, 32 x2, 1 — learnable_transform.py:13-60);
    smaller widths are used by the multi-chip dryrun to keep virtual-device CPU
    execution fast while exercising the identical program structure."""
    dtype: jnp.dtype = jnp.float32
    use_s2d: bool = True
    width: int = 32
    pre_blocked: bool = False   # input already space_to_depth-blocked (callers
    # hoist the blocking copy out of their remat scope so it is not recomputed
    # in backward; only valid when the unblocked spatial dims are all even)

    @nn.compact
    def __call__(self, x):
        w1, w2 = self.width, 2 * self.width
        def block(x, features, name):
            # 'conv_out' names the (bf16) conv results for policy-based remat:
            # save these, recompute the f32 norm/activation in backward — the f32
            # norm intermediates otherwise dominate saved-activation HBM (measured
            # 21GB OOM at the default workload without any ATM remat)
            x = nn.Conv(features, (5, 5, 5), padding='SAME', dtype=self.dtype,
                        name=name)(x)
            x = checkpoint_name(x, 'conv_out')
            x = instance_norm_stateless(x)
            return nn.leaky_relu(x, negative_slope=0.01)

        def block_s2d(x, features, name):
            x = S2dConv5(features, dtype=self.dtype, name=name)(x)
            x = checkpoint_name(x, 'conv_out')
            x = instance_norm_stateless_s2d(x, features)
            return nn.leaky_relu(x, negative_slope=0.01)

        def pool(x):
            return nn.avg_pool(x, (2, 2, 2), strides=(2, 2, 2))

        even = all(s % 2 == 0 for s in x.shape[1:4])
        if self.use_s2d and (even or self.pre_blocked):
            if not self.pre_blocked:
                x = space_to_depth(x)
            x = block_s2d(x, w1, 'Conv_0')
            x = pool_from_s2d(x, w1)
            x = space_to_depth(x)
            x = block_s2d(x, w2, 'Conv_1')
            x = block_s2d(x, w2, 'Conv_2')
            x = pool_from_s2d(x, w2)
        else:
            x = pool(block(x, w1, 'Conv_0'))
            x = pool(block(block(x, w2, 'Conv_1'), w2, 'Conv_2'))
        x = pool(block(block(x, w2, 'Conv_3'), w2, 'Conv_4'))
        x = pool(block(block(x, w2, 'Conv_5'), w1, 'Conv_6'))
        x = block(x, w1, 'Conv_7')
        x = nn.Conv(1, (1, 1, 1), dtype=self.dtype, name='Conv_8')(x)
        return instance_norm_stateless(x)


class LocalizationNet(nn.Module):
    """ConvNet backbone + dense head emitting ap_space + 3*vox_range + 1 params."""
    output_size: int
    dtype: jnp.dtype = jnp.float32
    width: int = 32
    pre_blocked: bool = False

    @nn.compact
    def __call__(self, x):
        h = ConvNet(dtype=self.dtype, width=self.width,
                    pre_blocked=self.pre_blocked)(x)
        h = h.reshape(h.shape[0], -1)
        return nn.Dense(self.output_size, dtype=jnp.float32)(h)
