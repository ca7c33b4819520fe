"""EPix2Vox / Pix2Vox multi-view 3D reconstruction baselines.

flax re-implementation of the reference's related-work models
(/root/reference/acquisition_focus/related_works/epix2vox/epix2vox.py:62-104 and
models/{encoder,decoder,merger,refiner}_128.py): a ResNet50-stem 2D encoder over
224^2 3-channel view renderings, a per-view 3D transposed-conv decoder (2^3 -> 128^3),
a context-aware merger (softmax view weighting), and a residual refiner (constructed
and optimized but never invoked by the reference forward — replicated as-is).

Deviations (documented):
* the reference initializes the encoder from ImageNet-pretrained torchvision
  ResNet50 weights — unavailable here; Kaiming-initialized (the reference applies the
  same ``init_weights`` to everything else);
* BatchNorm uses per-batch statistics in both train and eval (the reference trains
  with batch stats; running-average eval stats are not tracked to keep the model a
  single params pytree).
"""

from functools import partial
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class _BatchNorm(nn.Module):
    """True batch normalization on the CURRENT batch's statistics: per-channel
    mean/var over batch + spatial dims, learned scale/bias (init 1/0, reference
    init_weights, epix2vox.py:26-28). Matches torch BatchNorm's train-mode
    computation; eval also uses batch stats (documented deviation — no running
    averages, keeping the model a single params pytree).

    Round-4 collapse diagnosis: the previous implementation used flax GroupNorm
    with group_size = n_channels, which normalizes PER SAMPLE over
    (spatial, all channels) — a layer norm, never touching the batch axis and
    erasing per-channel activation statistics that the Pix2Vox architecture
    (BatchNorm between every conv and its ReLU/sigmoid) is designed around."""
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (C,))
        bias = self.param('bias', nn.initializers.zeros, (C,))
        axes = tuple(range(x.ndim - 1))
        xf = x.astype(jnp.float32)
        mean = xf.mean(axes)
        var = xf.var(axes)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(x.dtype)


def _batch_norm(x, name):
    return _BatchNorm(name=name)(x)


# Reference init_weights (related_works/epix2vox/epix2vox.py:19-30): kaiming_normal
# on every (transposed) conv weight, zero bias; normal(0, 0.01) on linear weights.
_KAIMING = nn.initializers.variance_scaling(2.0, 'fan_in', 'normal')
_Conv = partial(nn.Conv, kernel_init=_KAIMING)
_ConvT = partial(nn.ConvTranspose, kernel_init=_KAIMING)
_Dense = partial(nn.Dense, kernel_init=nn.initializers.normal(0.01))


class _Bottleneck(nn.Module):
    """ResNet bottleneck: 1x1 -> 3x3 (stride) -> 1x1 (4x expansion)."""
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        out = _Conv(self.features, (1, 1), use_bias=False, name='conv1')(x)
        out = _batch_norm(out, 'bn1')
        out = nn.relu(out)
        out = _Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                      padding='SAME', use_bias=False, name='conv2')(out)
        out = _batch_norm(out, 'bn2')
        out = nn.relu(out)
        out = _Conv(self.features * 4, (1, 1), use_bias=False, name='conv3')(out)
        out = _batch_norm(out, 'bn3')
        if residual.shape[-1] != self.features * 4 or self.stride != 1:
            residual = _Conv(self.features * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name='down')(x)
            residual = _batch_norm(residual, 'bn_down')
        return nn.relu(out + residual)


class ResNet50Stem(nn.Module):
    """conv1..layer2 of ResNet50: (B, 224, 224, 3) -> (B, 28, 28, 512)."""

    @nn.compact
    def __call__(self, x):
        x = _Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name='conv1')(x)
        x = _batch_norm(x, 'bn1')
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for i in range(3):   # layer1: 3 bottlenecks @ 64
            x = _Bottleneck(64, name=f'l1_b{i}')(x)
        for i in range(4):   # layer2: 4 bottlenecks @ 128, stride 2 first
            x = _Bottleneck(128, stride=2 if i == 0 else 1, name=f'l2_b{i}')(x)
        return x


class Epix2VoxEncoder(nn.Module):
    """Per-view features (B, V, 224, 224, 3) -> (B, V, 8, 8, 256); optional
    cross-view 3D conv when use_epix2vox (reference encoder_128.py:34-38,57-58)."""
    n_views: int
    use_epix2vox: bool = True
    leaky: float = 0.2

    @nn.compact
    def __call__(self, views):
        B, V = views.shape[0], views.shape[1]
        x = views.reshape((B * V,) + views.shape[2:])
        x = ResNet50Stem(name='resnet')(x)                       # (BV, 28, 28, 512)
        x = _Conv(512, (3, 3), padding='VALID', name='l1_conv')(x)
        x = nn.elu(_batch_norm(x, 'l1_bn'))                      # (BV, 26, 26, 512)
        x = _Conv(512, (3, 3), padding='VALID', name='l2_conv')(x)
        x = nn.elu(_batch_norm(x, 'l2_bn'))                      # (BV, 24, 24, 512)
        x = nn.max_pool(x, (3, 3), strides=(3, 3))               # (BV, 8, 8, 512)
        x = _Conv(256, (1, 1), name='l3_conv')(x)
        x = nn.elu(_batch_norm(x, 'l3_bn'))                      # (BV, 8, 8, 256)
        x = x.reshape(B, V, 8, 8, 256)

        if self.use_epix2vox:
            # cross-view fusion: a 3D conv whose channel axis is the view axis
            # collapses all views into ONE fused feature map (reference
            # encoder_128.py:34-38,57-58 — the decoder then sees a single 'view')
            h = jnp.transpose(x, (0, 2, 3, 4, 1))                # (B, 8, 8, 256, V)
            h = _Conv(1, (3, 3, 3), padding='SAME', name='l4_conv')(h)
            h = _batch_norm(h, 'l4_bn')
            h = nn.leaky_relu(h, negative_slope=self.leaky)
            x = jnp.transpose(h, (0, 4, 1, 2, 3))                # (B, 1, 8, 8, 256)
        return x


class Epix2VoxDecoder(nn.Module):
    """Per-view volume generation: (B, V, 8, 8, 256) -> raw (B, V, 128^3, 9),
    coarse (B, V, 128^3) (reference decoder_128.py:50-81)."""

    @nn.compact
    def __call__(self, feats):
        B, V = feats.shape[0], feats.shape[1]
        x = feats.reshape(B * V, 2, 2, 2, 2048)
        specs = [(512,), (128,), (32,), (32,), (32,), (8,)]
        for i, (f,) in enumerate(specs):
            x = _ConvT(f, (4, 4, 4), strides=(2, 2, 2), padding='SAME',
                                 use_bias=False, name=f'up{i}')(x)
            x = _batch_norm(x, f'up{i}_bn')
            x = nn.relu(x)                                       # ... -> (BV,128^3,8)
        raw = x
        vol = nn.sigmoid(_ConvT(1, (1, 1, 1), use_bias=False,
                                          name='head')(x))       # (BV, 128^3, 1)
        raw = jnp.concatenate([raw, vol], axis=-1)               # (BV, 128^3, 9)
        S = raw.shape[1]
        return (raw.reshape((B, V, S, S, S, 9)),
                vol.reshape(B, V, S, S, S))


class Epix2VoxMerger(nn.Module):
    """Context-aware per-view softmax weighting (reference merger_128.py:10-67)."""
    leaky: float = 0.2

    @nn.compact
    def __call__(self, raw_features, coarse_volumes):
        B, V = raw_features.shape[0], raw_features.shape[1]
        x = raw_features.reshape((B * V,) + raw_features.shape[2:])
        for i, f in enumerate((16, 8, 4, 2, 1)):
            x = _Conv(f, (3, 3, 3), padding='SAME', name=f'm{i}_conv')(x)
            x = _batch_norm(x, f'm{i}_bn')
            x = nn.leaky_relu(x, negative_slope=self.leaky)
        S = x.shape[1]
        from acquisition_focus_tpu.ops.channel_ops import (
            channel_softmax, channel_sum)
        weights = channel_softmax(x.reshape(B, V, S, S, S))
        merged = channel_sum(coarse_volumes * weights, keepdims=False)
        return jnp.clip(merged, 0.0, 1.0)


class Epix2VoxRefiner(nn.Module):
    """Residual volume refiner (reference refiner_128.py; constructed by the
    reference but never called from its forward — kept for optimizer parity)."""
    leaky: float = 0.2

    @nn.compact
    def __call__(self, vol):
        x = vol[..., None]
        skips = []
        for i, f in enumerate((8, 16, 32, 64, 128)):
            x = _Conv(f, (4, 4, 4), padding=2, name=f'r{i}_conv')(x)
            x = _batch_norm(x, f'r{i}_bn')
            x = nn.leaky_relu(x, negative_slope=self.leaky)
            x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
            skips.append(x)
        B = x.shape[0]
        h = x.reshape(B, -1)
        h = nn.relu(_Dense(2048, name='fc1')(h))
        h = nn.relu(_Dense(8192, name='fc2')(h))
        x = h.reshape(x.shape)
        for i, f in enumerate((64, 32, 16, 8)):
            x = _ConvT(f, (4, 4, 4), strides=(2, 2, 2), padding='SAME',
                                 use_bias=False, name=f'u{i}')(x)
            x = _batch_norm(x, f'u{i}_bn')
            x = nn.relu(x)
        x = nn.sigmoid(_ConvT(1, (4, 4, 4), strides=(2, 2, 2),
                                        padding='SAME', use_bias=False,
                                        name='u_out')(x))
        return (vol + x[..., 0]) * 0.5


class EPix2VoxModel128(nn.Module):
    """Full baseline: views (B, V, 224, 224, 3) -> volume (B, 128, 128, 128)."""
    n_views: int
    use_epix2vox: bool = True     # False = plain Pix2Vox
    use_merger: bool = True

    @nn.compact
    def __call__(self, views):
        feats = Epix2VoxEncoder(self.n_views, self.use_epix2vox, name='encoder')(views)
        raw, coarse = Epix2VoxDecoder(name='decoder')(feats)
        if self.use_merger:
            return Epix2VoxMerger(name='merger')(raw, coarse)
        return coarse.mean(axis=1)


def epix2vox_interface_input(b_input, n_views, out_hw=224):
    """Adapt slice one-hots (B, V*C, S, S) to EPix2Vox inputs: per-view foreground
    sum, resized to 224^2, replicated to 3 channels, x255
    (reference interface_models.py:10-17, generalized from its 2-view chunk)."""
    import jax
    B, VC, S, _ = b_input.shape
    C = VC // n_views
    views = b_input.reshape(B, n_views, C, S, S)
    fg = views[:, :, 1:].sum(axis=2)                                   # (B, V, S, S)
    fg = jax.image.resize(fg, (B, n_views, out_hw, out_hw), method='linear')
    return jnp.repeat(fg[..., None], 3, axis=-1) * 255.0               # (B,V,H,W,3)


def epix2vox_interface_output(volume):
    """(B, S, S, S) occupancy -> (B, 2, S, S, S) bg/fg channel stack
    (reference interface_models.py:19-21)."""
    return jnp.stack([1.0 - volume, volume], axis=1)
