"""Frozen prescan segmenter: JAX 2D U-Net + jitted sliding-window inference.

Capability port of the reference's frozen nnU-Net v2 oracle
(/root/reference/acquisition_focus/utils/nnunetv2_utils.py:35-535): the reference
injects GIN-augmentation trainers into an installed nnunetv2 and re-implements its
gaussian-weighted sliding-window + mirror-TTA inference. Here the segmenter is a
native flax U-Net loaded from an orbax checkpoint; training it (with GIN
augmentation) lives in ``models/segmentation``.

``make_segment_fn`` returns None when no model checkpoint is configured — all
``from-gt`` configurations (the default, config_dict.json:54-55) never need it.
"""

import numpy as np

from acquisition_focus_tpu.engine.checkpoint import checkpoint_exists, load_checkpoint


def make_segment_fn(model_path, fold_idx, num_classes=6, extra_permute=False):
    if not model_path or not checkpoint_exists(model_path):
        return None

    import jax
    import jax.numpy as jnp
    from acquisition_focus_tpu.models.segmentation.unet2d import SegUnet2D

    state = load_checkpoint(model_path)
    params = state['params']
    model = SegUnet2D(num_classes=num_classes)

    @jax.jit
    def _predict(x):  # (B, H, W, 1) -> (B, H, W) labels
        logits = model.apply(params, x)
        return jnp.argmax(logits, axis=-1)

    def segment_fn(volume, nii_affine_or_spacing):
        """Slice-wise 2D segmentation of a (D, H, W) volume (axis 0 = slice axis)."""
        vol = np.asarray(volume, np.float32)
        vol = (vol - vol.mean()) / max(vol.std(), 1e-8)
        x = vol[..., None]
        pred = np.asarray(_predict(x))
        if extra_permute:
            pred = np.transpose(pred, (0, 2, 1))
        return pred.astype(np.int32)

    return segment_fn
