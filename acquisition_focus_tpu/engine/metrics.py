"""Segmentation metrics.

Device metrics (dice, IoU, class volumes) are pure jnp; surface metrics (HD/HD95) run
host-side on numpy via exact Euclidean distance transforms at the reference's cadence
(every 20th epoch + last + test — reference run_dl.py:499-532). Semantics follow
monai's ``compute_dice`` / ``compute_iou`` / ``compute_hausdorff_distance``: per-batch
per-class scores, NaN where the ground truth class is empty.
"""

import numpy as np
import jax.numpy as jnp
from scipy.ndimage import binary_erosion, distance_transform_edt


def dice_per_class(pred_onehot, target_onehot):
    """(B, C) dice; NaN where the target class is empty (monai ignore_empty)."""
    axes = tuple(range(2, pred_onehot.ndim))
    p = pred_onehot.astype(jnp.float32)
    t = target_onehot.astype(jnp.float32)
    inter = (p * t).sum(axes)
    denom = p.sum(axes) + t.sum(axes)
    dice = 2.0 * inter / jnp.maximum(denom, 1e-8)
    return jnp.where(t.sum(axes) > 0, dice, jnp.nan)


def iou_per_class(pred_onehot, target_onehot):
    axes = tuple(range(2, pred_onehot.ndim))
    p = pred_onehot.astype(jnp.float32)
    t = target_onehot.astype(jnp.float32)
    inter = (p * t).sum(axes)
    union = jnp.maximum(p, t).sum(axes)
    iou = inter / jnp.maximum(union, 1e-8)
    return jnp.where(t.sum(axes) > 0, iou, jnp.nan)


def _surface(mask):
    if not mask.any():
        return None
    eroded = binary_erosion(mask, iterations=1, border_value=0)
    return mask & ~eroded


def _directed_distances(surf_a, dist_to_b):
    return dist_to_b[surf_a]


def hausdorff_distance(pred_mask, target_mask, percentile=None):
    """Symmetric (percentile-)Hausdorff distance between two binary masks, in voxels.

    monai semantics: max over the two directed distances; each directed distance is
    the max (or given percentile) of surface-to-surface distances. NaN when either
    mask is empty.
    """
    pred_mask = np.asarray(pred_mask, bool)
    target_mask = np.asarray(target_mask, bool)
    sp, st = _surface(pred_mask), _surface(target_mask)
    if sp is None or st is None:
        return float('nan')
    d_to_t = distance_transform_edt(~st)
    d_to_p = distance_transform_edt(~sp)
    d_pt = _directed_distances(sp, d_to_t)
    d_tp = _directed_distances(st, d_to_p)
    if percentile is None:
        return float(max(d_pt.max(), d_tp.max()))
    return float(max(np.percentile(d_pt, percentile), np.percentile(d_tp, percentile)))


def hausdorff_per_class(pred_labels, target_labels, num_classes, percentile=None):
    """(B, C) HD (or HD95) in voxels over dense label maps; class 0 returns 0 to
    mirror the reference's zero-padded background column (run_dl.py:515,520)."""
    pred_labels = np.asarray(pred_labels)
    target_labels = np.asarray(target_labels)
    B = pred_labels.shape[0]
    out = np.zeros((B, num_classes), np.float64)
    for b in range(B):
        for c in range(1, num_classes):
            out[b, c] = hausdorff_distance(
                pred_labels[b] == c, target_labels[b] == c, percentile)
    return out


def accumulate_label_scores(store, metric_name, scores, label_tags, exclude_bg=True):
    """Append per-sample scores (B, C) into {metric: {tag: [values...]}}.

    Parity: ``get_batch_score_per_label`` (torch_utils.py:79-100).
    """
    scores = np.asarray(scores)
    for tag_idx, tag in enumerate(label_tags):
        if exclude_bg and tag_idx == 0:
            continue
        vals = store.setdefault(metric_name, {}).setdefault(tag, [])
        vals.extend(float(v) for v in scores[:, tag_idx])
    return store


def reduce_label_scores(store):
    """-> (nanmean_per_label, std_per_label, nanmean_overall, std_overall).

    Parity: ``reduce_label_scores_epoch`` (torch_utils.py:48-75).
    """
    nanmean_per_label, std_per_label = {}, {}
    nanmean_oa, std_oa = {}, {}
    for m_name, m_dict in store.items():
        nanmean_per_label[m_name] = {t: float(np.nanmean(v)) for t, v in m_dict.items()}
        std_per_label[m_name] = {t: float(np.std(v)) for t, v in m_dict.items()}
        all_vals = [x for v in m_dict.values() for x in v]
        nanmean_oa[m_name] = float(np.nanmean(all_vals)) if all_vals else float('nan')
        std_oa[m_name] = float(np.std(all_vals)) if all_vals else float('nan')
    return nanmean_per_label, std_per_label, nanmean_oa, std_oa
