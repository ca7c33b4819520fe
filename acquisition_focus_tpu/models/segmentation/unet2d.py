"""2D segmentation U-Net for the frozen prescan oracle.

Native replacement for the reference's pretrained nnU-Net v2 2D configuration
(/root/reference/acquisition_focus/utils/nnunetv2_utils.py:35-44; trainer variants in
models/segmentation/nnUNetTrainer_GIN*.py): a plain conv U-Net with instance norm +
LeakyReLU, trainable in-framework with GIN augmentation (``segmentation.gin``),
exported as an orbax checkpoint and served by ``engine.segmenter``.
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from acquisition_focus_tpu.models.localization import instance_norm


def _block(x, features, stride, dtype, name):
    x = nn.Conv(features, (3, 3), strides=(stride, stride), padding='SAME',
                dtype=dtype, name=f'{name}_conv')(x)
    x = instance_norm(x, use_scale=True, use_bias=True, name=f'{name}_norm')
    return nn.leaky_relu(x, negative_slope=0.01)


class SegUnet2D(nn.Module):
    """(B, H, W, C_in) -> (B, H, W, num_classes) logits."""
    num_classes: int
    features: Sequence[int] = (32, 64, 128, 256, 512)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        skips = []
        for s, f in enumerate(self.features):
            x = _block(x, f, 1 if s == 0 else 2, self.dtype, f'enc{s}a')
            x = _block(x, f, 1, self.dtype, f'enc{s}b')
            skips.append(x)

        y = skips[-1]
        for s in range(len(self.features) - 2, -1, -1):
            y = nn.ConvTranspose(self.features[s], (2, 2), strides=(2, 2),
                                 dtype=self.dtype, name=f'dec{s}_up')(y)
            y = jnp.concatenate([y, skips[s]], axis=-1)
            y = _block(y, self.features[s], 1, self.dtype, f'dec{s}a')
            y = _block(y, self.features[s], 1, self.dtype, f'dec{s}b')

        return nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                       name='seg_head')(y)
