"""Reconstruction loss: soft Dice + cross-entropy.

Pure-JAX reimplementation of nnU-Net's ``DC_and_CE_loss`` as the reference invokes it
with default kwargs (/root/reference/acquisition_focus/running/run_dl.py:333-334,
import at nnunetv2_utils.py:31): softmax nonlinearity, per-sample (not batch) dice over
ALL classes incl. background, smooth=1.0, unit CE and dice weights, loss = CE - dice.
"""

import jax.numpy as jnp
import jax.nn

from acquisition_focus_tpu.ops.channel_ops import (
    channel_log_softmax, channel_softmax, channel_sum)


def soft_dice(logits, target_onehot, smooth=1.0):
    """Per-sample-per-class soft dice coefficient (B, C)."""
    probs = channel_softmax(logits)
    axes = tuple(range(2, logits.ndim))
    tp = (probs * target_onehot).sum(axes)
    fp = (probs * (1.0 - target_onehot)).sum(axes)
    fn = ((1.0 - probs) * target_onehot).sum(axes)
    return (2.0 * tp + smooth) / (2.0 * tp + fp + fn + smooth)


def cross_entropy(logits, target_onehot):
    logp = channel_log_softmax(logits)
    return -channel_sum(target_onehot * logp, keepdims=False).mean()


def dice_ce_loss(logits, target_onehot, weight_ce=1.0, weight_dice=1.0):
    """CE + (1 - dice)-style combined loss; target is one-hot along axis 1."""
    target_onehot = target_onehot.astype(logits.dtype)
    dc = soft_dice(logits, target_onehot).mean()
    ce = cross_entropy(logits, target_onehot)
    return weight_ce * ce - weight_dice * dc


def binarize_onehot(onehot):
    """Collapse a (B, C, ...) one-hot/logit stack to (background, foreground-sum).

    Parity: ``get_binarized_from_onehot_label`` (torch_utils.py:153-156).
    """
    return jnp.concatenate(
        [onehot[:, 0:1], channel_sum(onehot[:, 1:])], axis=1)
