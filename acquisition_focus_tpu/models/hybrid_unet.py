"""Hybrid 2D-encoder / 3D-decoder U-Net for multi-slice -> volume reconstruction.

TPU-first re-design of the reference model (/root/reference/acquisition_focus/models/
hybrid_unet.py:9-94, which subclasses nnU-Net's PlainConvUNet and patches its encoder
to grouped 2D convs): here the architecture is written directly in flax, channels-last
for TPU conv layouts, with the per-view grouping expressed as feature_group_count.

Skip connections re-embed each 2D feature map into 3D space along the (learned) slice
affine. The reference zero-fills an S^3 volume, writes the slice at the center plane
and 3D-grid-samples it (hybrid_unet.py:71-94); we use the collapsed plane-sampling op
(``ops.resample.sample_slice_into_volume``, or its Pallas slab-skipping MXU kernel on
TPU) — same math, ~8x less memory traffic, measured 3.4x faster full fwd+bwd.

Encoder features per stage: n_views * [16, 32, 64, 128, 256, 256], two convs per
stage, InstanceNorm(affine) + LeakyReLU, stride-2 downsampling from stage 1 on
(reference hybrid_unet.py:12-34). Decoder: transposed conv upsampling, skip concat,
two convs per stage, 1x1x1 segmentation head.
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

import jax
from jax.ad_checkpoint import checkpoint_name

from acquisition_focus_tpu.models.localization import instance_norm
from acquisition_focus_tpu.ops.affine import affine_zooms, scale_affine_columns
from acquisition_focus_tpu.ops.pallas import conv3d as pallas_conv3d
from acquisition_focus_tpu.ops.pallas.plane_resample import (
    plane_resample_pallas, plane_resample_supported)
from acquisition_focus_tpu.ops.resample import sample_slice_into_volume

BASE_FEATURES = (16, 32, 64, 128, 256, 256)


def _conv_block_2d(x, features, stride, groups, dtype, name_prefix):
    x = nn.Conv(features, (3, 3), strides=(stride, stride), padding='SAME',
                feature_group_count=groups, dtype=dtype, name=f'{name_prefix}_conv')(x)
    x = instance_norm(x, use_scale=True, use_bias=True, name=f'{name_prefix}_norm')
    return nn.leaky_relu(x, negative_slope=0.01)


class Conv3x3x3(nn.Module):
    """Drop-in for ``nn.Conv(features, (3,3,3), padding='SAME')`` — identical
    'kernel'/'bias' params (checkpoint-compatible) — that can route the forward
    through the Pallas direct conv (ops/pallas/conv3d.py) with XLA gradients.
    The Pallas path engages only on TPU AND when the static shape qualifies
    (W % 128 == 0 etc., i.e. the full-resolution decoder level); every other
    level falls back to the XLA conv."""
    features: int
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False     # False | True/'fwd' (Pallas fwd, XLA grads)
                                 # | 'fwdN' (Pallas fwd only when Ci >= N: the
                                 #   kernel contracts over Ci padded to the 128
                                 #   lane width, so small-Ci convs run at low
                                 #   MXU occupancy — e.g. 13.5 TF/s at Ci=48 vs
                                 #   30.9 at Ci=96, device trace round 3)
                                 # | 'wg' (Pallas fwd + wgrad, XLA dx)
                                 # | 'dx' (Pallas fwd + input grad, XLA wgrad)
                                 # | 'full' (Pallas fwd + dx + dw kernels)

    @nn.compact
    def __call__(self, x):
        ci = x.shape[-1]
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (3, 3, 3, ci, self.features), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros,
                          (self.features,), jnp.float32)
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        mode = self.use_pallas
        if isinstance(mode, str) and mode[:3] == 'fwd' and mode[3:].isdigit():
            mode = 'fwd' if ci >= int(mode[3:]) else False
        if mode not in (False, True, 'fwd', 'wg', 'dx', 'full'):
            # a typo ('wgrad', 'ful', 'fwdx', ...) must fail loudly, not
            # silently bench the default fwd kernel while being recorded as
            # the requested experiment
            raise ValueError(
                f"unknown use_pallas mode {self.use_pallas!r}: expected one of "
                "False, True, 'fwd', 'fwdN' (N = min channel count), 'wg', "
                "'dx', 'full'")
        if (mode and jax.default_backend() == 'tpu'
                and pallas_conv3d.supports_conv3d(x.shape, kernel.shape)):
            conv = {'full': pallas_conv3d.conv3d_pg,
                    'wg': pallas_conv3d.conv3d_wg,
                    'dx': pallas_conv3d.conv3d_dx}.get(
                        mode, pallas_conv3d.conv3d)
            y = conv(x, kernel)
        else:
            y = pallas_conv3d._xla_conv(x, kernel)
        return y + bias


def _conv_block_3d(x, features, dtype, name_prefix, use_pallas_conv=False,
                   level=0):
    # 'conv_in{level}'/'conv_out' mark the bf16 conv operands/results for the
    # decoder's policy-based remat (see HybridUnet.decoder_save_names). The
    # default policy saves only 'conv_out'; adding 'conv_in{level}' also saves
    # that level's conv inputs so XLA's wgrad consumes a stored activation
    # instead of recomputing the norm/leaky chain inside its backward fusion
    # (~+1.2 GB at 128^3 reference widths for level 0, which dominates — the
    # per-level names let the experiment target dec0 alone). 'conv_in' in
    # decoder_save_names expands to every level. Measured experiments, not the
    # default.
    x = checkpoint_name(x, f'conv_in{level}')
    x = Conv3x3x3(features, dtype=dtype, use_pallas=use_pallas_conv,
                  name=f'{name_prefix}_conv')(x)
    x = checkpoint_name(x, 'conv_out')
    x = instance_norm(x, use_scale=True, use_bias=True, name=f'{name_prefix}_norm')
    return nn.leaky_relu(x, negative_slope=0.01)


class SkipConnector(nn.Module):
    """Re-embed grouped 2D features into 3D along per-view slice affines.

    Input (B, S, S, n_views*f) + affines (n_views, B, 4, 4) -> (B, S, S, S, n_views*f).
    """
    n_views: int
    use_pallas: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, grid_affines):
        B, S, _, C = x.shape
        f = C // self.n_views

        # Strip the zoom from the forward slicing affine, then invert: samples from
        # single-slice space back into volume space (reference hybrid_unet.py:80-87).
        norm_aff = scale_affine_columns(grid_affines, 1.0 / affine_zooms(grid_affines))
        inv_aff = jnp.linalg.inv(norm_aff.astype(jnp.float32))

        # Channels-first inside the gather: with few channels per view (16..256),
        # a channels-minor layout pads the lane dimension up to 8x on TPU (observed
        # 16GB OOM); (C, N)-shaped gathers pad nothing. On TPU the Pallas
        # slab-skipping MXU kernel replaces the XLA gather (3-6x faster). A bf16
        # compute dtype also switches its MXU contractions to bf16 ('fast'): the
        # features/gradients flowing through are bf16-rounded anyway.
        on_tpu = (self.use_pallas and jax.default_backend() == 'tpu'
                  and plane_resample_supported(S, f))
        fast = self.dtype == jnp.bfloat16
        views = []
        for v in range(self.n_views):
            slc = jnp.transpose(x[..., v * f:(v + 1) * f], (0, 3, 1, 2))
            if on_tpu:
                vol = plane_resample_pallas(slc, inv_aff[v], S, fast)
            else:
                vol = sample_slice_into_volume(slc, inv_aff[v], S)
            views.append(jnp.transpose(vol, (0, 2, 3, 4, 1)))
        return jnp.concatenate(views, axis=-1)


class DecoderStage(nn.Module):
    """One decoder level: upsample, concat skip, two conv blocks (rematerialized —
    the 128^3 concat/conv activations dominate peak HBM)."""
    features: int
    dtype: jnp.dtype
    use_pallas_conv: bool = False
    level: int = 0

    @nn.compact
    def __call__(self, y, skip):
        y = nn.ConvTranspose(self.features, (2, 2, 2), strides=(2, 2, 2),
                             dtype=self.dtype, name='up')(y)
        y = checkpoint_name(y, 'conv_out')
        y = jnp.concatenate([y, skip], axis=-1)
        y = _conv_block_3d(y, self.features, self.dtype, 'a',
                           self.use_pallas_conv, self.level)
        return _conv_block_3d(y, self.features, self.dtype, 'b',
                              self.use_pallas_conv, self.level)


class HybridUnet(nn.Module):
    """(B, n_views*num_classes, S, S) slices + (n_views, B, 4, 4) slice affines
    -> (B, num_classes, S, S, S) reconstruction logits."""
    n_views: int
    num_classes: int
    base_features: Sequence[int] = BASE_FEATURES
    dtype: jnp.dtype = jnp.float32
    remat_skips: bool = True
    use_pallas: bool = True
    use_pallas_conv: bool = False
    # which checkpoint_name-marked activations the decoder remat policy saves
    # (ignored when remat_skips=True, which recomputes everything)
    decoder_save_names: Sequence[str] = ('conv_out',)

    @nn.compact
    def __call__(self, x, grid_affines):
        V = self.n_views
        feats = [V * f for f in self.base_features]
        n_stages = len(feats)

        x = jnp.transpose(x, (0, 2, 3, 1))  # channels-last

        # 2D grouped encoder
        skips = []
        for s, f in enumerate(feats):
            x = _conv_block_2d(x, f, 1 if s == 0 else 2, V, self.dtype, f'enc{s}a')
            x = _conv_block_2d(x, f, 1, V, self.dtype, f'enc{s}b')
            skips.append(x)

        # re-embed every skip into 3D. remat_skips=True rematerializes the
        # connector like the reference's torch.utils.checkpoint around the
        # re-embedding grid sample; the default (False) keeps it plain — the
        # Pallas plane-resample custom VJP saves only (slices, theta) residuals,
        # and the 3D outputs are the decoder's saved inputs anyway.
        connector_cls = nn.remat(SkipConnector) if self.remat_skips else SkipConnector
        connector = connector_cls(V, use_pallas=self.use_pallas, dtype=self.dtype,
                                  name='skip_connector')
        skips3d = [connector(s_, grid_affines) for s_ in skips]

        # 3D decoder: always checkpointed per stage. remat_skips=True recomputes
        # the whole stage in backward (max memory savings); the default policy
        # saves only the named bf16 'conv_out' activations and recomputes the f32
        # instance-norm/leaky elementwise — no conv recompute, and the f32 norm
        # intermediates (which OOM 16GB HBM if saved) never persist.
        if self.remat_skips:
            stage_cls = nn.remat(DecoderStage)
        else:
            # expand 'conv_in' to every decoder level; validate so a typo'd
            # save name benches the default policy loudly, not silently
            valid = {'conv_out', 'conv_in'} | {
                f'conv_in{s}' for s in range(n_stages - 1)}
            unknown = set(self.decoder_save_names) - valid
            if unknown:
                raise ValueError(
                    f"unknown decoder_save_names {sorted(unknown)}: expected "
                    f"a subset of {sorted(valid)}")
            save_names = []
            for n in self.decoder_save_names:
                save_names += [f'conv_in{s}' for s in range(n_stages - 1)] \
                    if n == 'conv_in' else [n]
            stage_cls = nn.remat(
                DecoderStage,
                policy=jax.checkpoint_policies.save_only_these_names(
                    *save_names))
        y = skips3d[-1]
        for s in range(n_stages - 2, -1, -1):
            y = stage_cls(feats[s], self.dtype, self.use_pallas_conv, s,
                          name=f'dec{s}')(y, skips3d[s])

        y = nn.Conv(self.num_classes, (1, 1, 1), dtype=jnp.float32, name='seg_head')(y)
        return jnp.transpose(y, (0, 4, 1, 2, 3))
