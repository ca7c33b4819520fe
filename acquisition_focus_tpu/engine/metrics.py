"""Segmentation metrics.

Device metrics (dice, IoU, class volumes) are pure jnp; surface metrics (HD/HD95)
run at the reference's cadence (every 20th epoch + last + test — reference
run_dl.py:499-532) and exist in two implementations with identical semantics:

* a host-side numpy/scipy exact-EDT path (the original, kept as the CPU fallback
  and the parity oracle), and
* a device path (:func:`hausdorff_per_class_device`) computing the exact squared
  Euclidean distance transform as three separable min-plus passes — each axis pass
  is ``out[x] = min_j (g[j] + (x-j)^2)``, an elementwise-add + reduce that XLA
  fuses without materializing the (..., n, n) intermediate. At 128^3 the host path
  costs ~80-160 s per metric epoch on the 1-core build host; the device path is
  milliseconds on a v5e.

Semantics follow monai's ``compute_dice`` / ``compute_iou`` /
``compute_hausdorff_distance``: per-batch per-class scores, NaN where the ground
truth class is empty.
"""

from functools import partial

import numpy as np
import jax
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


def iou_per_class_labels(pred_labels, target_labels, num_classes):
    """(B, C) IoU from dense int label maps (jittable; avoids building one-hot
    volumes on the host). Same semantics as :func:`iou_per_class` on one-hots."""
    pred_labels = jnp.asarray(pred_labels)
    target_labels = jnp.asarray(target_labels)
    axes = tuple(range(1, pred_labels.ndim))
    cols = []
    for c in range(num_classes):   # static C: unrolled fused passes (PERF.md)
        p = pred_labels == c
        t = target_labels == c
        inter = (p & t).sum(axes).astype(jnp.float32)
        union = (p | t).sum(axes).astype(jnp.float32)
        t_sum = t.sum(axes).astype(jnp.float32)
        iou = inter / jnp.maximum(union, 1e-8)
        cols.append(jnp.where(t_sum > 0, iou, jnp.nan))
    return jnp.stack(cols, axis=1)


def _erode6_device(mask):
    """scipy ``binary_erosion`` with the default cross structure and
    border_value=0: a voxel survives iff it and all 6 face neighbors are set
    (outside the volume counts as unset)."""
    out = mask
    for axis in range(mask.ndim):
        n = mask.shape[axis]
        pad = [(1, 1) if a == axis else (0, 0) for a in range(mask.ndim)]
        padded = jnp.pad(mask, pad, constant_values=False)
        lo = jax.lax.slice_in_dim(padded, 0, n, axis=axis)
        hi = jax.lax.slice_in_dim(padded, 2, n + 2, axis=axis)
        out = out & lo & hi
    return out


_EDT_INF = 4.0e9  # > 3 * 65535^2: farther than any voxel in a representable volume


def _minplus_1d(g, axis):
    """One separable pass of the exact squared EDT along ``axis``:
    out[x] = min_j (g[j] + (x - j)^2). The broadcastered (..., n, n) operand is
    consumed by the min-reduce in one XLA fusion (never materialized)."""
    n = g.shape[axis]
    g = jnp.moveaxis(g, axis, -1)
    i = jnp.arange(n, dtype=jnp.float32)
    d2 = (i[:, None] - i[None, :]) ** 2
    out = jnp.min(g[..., None, :] + d2, axis=-1)
    return jnp.moveaxis(out, -1, axis)


def edt_squared_device(mask):
    """Exact squared Euclidean distance from every voxel to the nearest True
    voxel of ``mask`` (== scipy ``distance_transform_edt(~mask)**2``). All-False
    masks yield _EDT_INF everywhere."""
    g = jnp.where(mask, 0.0, _EDT_INF).astype(jnp.float32)
    for axis in range(mask.ndim):
        g = _minplus_1d(g, axis)
    return g


@partial(jax.jit, static_argnames=('num_classes',))
def hausdorff_per_class_device(pred_labels, target_labels, num_classes):
    """(B, C, 2) [HD, HD95] in voxels over dense label maps, on device.

    Exact-EDT surface distances with the host implementation's semantics:
    class 0 is 0 (reference's zero-padded background column, run_dl.py:515,520);
    NaN when either mask is empty; percentiles use numpy's default linear
    interpolation (jnp.nanpercentile matches).
    """
    pred_labels = jnp.asarray(pred_labels)
    target_labels = jnp.asarray(target_labels)
    cls = jnp.arange(1, num_classes)
    pm = pred_labels[:, None] == cls[None, :, None, None, None]  # (B, C-1, *S)
    tm = target_labels[:, None] == cls[None, :, None, None, None]
    B = pm.shape[0]
    pm = pm.reshape((-1,) + pm.shape[2:])
    tm = tm.reshape((-1,) + tm.shape[2:])

    def one_pair(pm, tm):
        # vmapped over B*(C-1) mask pairs: one program instance for all classes
        # (the unrolled per-class form compiled ~170 s at 128^3 x 6 classes)
        sp = pm & ~_erode6_device(pm)
        st = tm & ~_erode6_device(tm)
        d_to_t = jnp.sqrt(edt_squared_device(st))
        d_to_p = jnp.sqrt(edt_squared_device(sp))
        d_pt = jnp.where(sp, d_to_t, jnp.nan)
        d_tp = jnp.where(st, d_to_p, jnp.nan)
        vals = jnp.stack([
            jnp.maximum(jnp.nanmax(d_pt), jnp.nanmax(d_tp)),
            jnp.maximum(jnp.nanpercentile(d_pt, 95.0),
                        jnp.nanpercentile(d_tp, 95.0)),
        ])
        empty = (~pm.any()) | (~tm.any())
        return jnp.where(empty, jnp.nan, vals)

    vals = jax.vmap(one_pair)(pm, tm).reshape(B, num_classes - 1, 2)
    zeros = jnp.zeros((B, 1, 2), vals.dtype)  # class 0 column
    return jnp.concatenate([zeros, vals], axis=1)


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
