"""Frozen prescan segmenter: JAX 2D U-Net + jitted sliding-window inference with
gaussian tile weighting and mirror test-time augmentation.

Capability port of the reference's frozen nnU-Net v2 oracle
(/root/reference/acquisition_focus/utils/nnunetv2_utils.py:35-535): the reference
injects GIN trainers into an installed nnunetv2 and re-implements its
gaussian-weighted sliding-window + mirror-TTA prediction
(predict_sliding_window_return_logits :342-424, maybe_mirror_and_predict :426-451,
compute_gaussian :453-471, compute_steps_for_sliding_window :475-499). Here the
segmenter is a native flax U-Net loaded from an orbax checkpoint (train it with
``scripts/train_segmenter.py`` — GIN-augmented); the sliding-window machinery is
pure JAX with static tile grids.

``make_segment_fn`` returns None when no model checkpoint is configured — all
``from-gt`` configurations (the default, config_dict.json:54-55) never need it.
"""

from functools import partial

import numpy as np

from acquisition_focus_tpu.engine.checkpoint import checkpoint_exists, load_checkpoint


def compute_sliding_steps(image_size, tile_size, step_fraction=0.5):
    """Evenly spread tile origins covering the image (reference
    nnunetv2_utils.py:475-499)."""
    steps = []
    for img, tile in zip(image_size, tile_size):
        if img <= tile:
            steps.append([0])
            continue
        target_step = tile * step_fraction
        n = int(np.ceil((img - tile) / target_step)) + 1
        actual = (img - tile) / max(n - 1, 1)
        steps.append([int(round(actual * i)) for i in range(n)])
    return steps


def gaussian_importance_map(tile_size, sigma_scale=1.0 / 8):
    """Center-weighted tile importance (reference nnunetv2_utils.py:453-471)."""
    grids = np.meshgrid(*[np.arange(t, dtype=np.float64) for t in tile_size],
                        indexing='ij')
    g = np.ones(tile_size, np.float64)
    for grid, t in zip(grids, tile_size):
        sigma = t * sigma_scale
        g *= np.exp(-0.5 * ((grid - (t - 1) / 2.0) / sigma) ** 2)
    g /= g.max()
    g[g == 0] = g[g > 0].min()
    return g.astype(np.float32)


def make_tile_predictor(apply_fn, params, tile_hw, mirror_tta=True):
    """One jitted gaussian-weighted (+2^2 flip TTA) tile predictor for a fixed
    tile shape. Built ONCE per (segment_fn, tile shape): a fresh ``jax.jit``
    per call would miss the jit cache every time (new function object) and pay
    a full remote compile per slice through the TPU tunnel."""
    import jax
    import jax.numpy as jnp

    gauss = jnp.asarray(gaussian_importance_map(tile_hw))[..., None]

    @jax.jit
    def predict_tile(tile):
        logits = apply_fn(params, tile[None])[0]
        if mirror_tta:
            # 2^2 flip combinations (reference maybe_mirror_and_predict :426-451)
            for axes in ((0,), (1,), (0, 1)):
                logits = logits + jnp.flip(
                    apply_fn(params, jnp.flip(tile, axes)[None])[0], axes)
            logits = logits / 4.0
        return logits * gauss

    return predict_tile


def sliding_window_logits_2d(apply_fn, params, image, num_classes, tile_size,
                             mirror_tta=True, step_fraction=0.5,
                             predictor_cache=None):
    """Tiled 2D inference with gaussian blending and flip TTA.

    Args:
      apply_fn: (params, (B, th, tw, C_in)) -> (B, th, tw, num_classes).
      image: (H, W) or (H, W, C_in) float32 (already normalized).
      predictor_cache: optional dict reused across calls so the jitted tile
        predictor compiles once per tile shape (pass one per segment_fn).
    Returns: (H, W, num_classes) float32 logits.
    """
    import jax.numpy as jnp

    image = np.asarray(image, np.float32)
    if image.ndim == 2:
        image = image[..., None]
    H, W = image.shape[:2]
    th, tw = min(tile_size[0], H), min(tile_size[1], W)
    steps_h, steps_w = compute_sliding_steps((H, W), (th, tw), step_fraction)

    if predictor_cache is None:
        predictor_cache = {}
    key = (th, tw, bool(mirror_tta))
    if key not in predictor_cache:
        predictor_cache[key] = make_tile_predictor(
            apply_fn, params, (th, tw), mirror_tta)
    predict_tile = predictor_cache[key]

    acc = np.zeros((H, W, num_classes), np.float32)
    norm = np.zeros((H, W, 1), np.float32)
    g_np = np.asarray(gaussian_importance_map((th, tw)))[..., None]
    for sh in steps_h:
        for sw in steps_w:
            tile = jnp.asarray(image[sh:sh + th, sw:sw + tw])
            out = np.asarray(predict_tile(tile))
            acc[sh:sh + th, sw:sw + tw] += out
            norm[sh:sh + th, sw:sw + tw] += g_np
    return acc / np.maximum(norm, 1e-8)


def _spacing_from(nii_affine_or_spacing):
    """(4,4)/(B,4,4) affine or length-3 spacing -> (3,) mm spacing, or None."""
    if nii_affine_or_spacing is None:
        return None
    arr = np.asarray(nii_affine_or_spacing, np.float64)
    if arr.shape[-2:] == (4, 4):
        if arr.ndim == 3:
            arr = arr[0]
        return np.linalg.norm(arr[:3, :3], axis=0)
    return arr.reshape(-1)[:3]


def make_segment_fn(model_path, fold_idx, num_classes=6, extra_permute=False,
                    tile_size=(128, 128), mirror_tta=True,
                    train_spacing=(1.5, 1.5, 1.5)):
    """Build the frozen segmenter closure: (D, H, W) volume -> (D, H, W) labels,
    segmented slice-wise along axis 0 (the reference's 2D nnU-Net configuration).

    The closure takes the volume's nii affine (or spacing) and respaces the
    input to ``train_spacing`` before inference, resampling the labels back
    nearest-neighbor — the reference's nnU-Net does this internally from the
    lores prescan spacing it is handed (base_dataset.py:270-272,
    nnunetv2_utils.py:521-535). At the published configs prescan and hires are
    both 1.5 mm iso (config_dict.json:44-53) so this is an identity there.

    ``extra_permute`` transposes each output slice — the reference's MMWHS axis
    workaround (mmwhs_dataset.py:48-50). Returns None without a checkpoint.
    """
    if not model_path or not checkpoint_exists(model_path):
        return None

    import jax
    import jax.numpy as jnp
    from acquisition_focus_tpu.models.segmentation.unet2d import SegUnet2D

    state = load_checkpoint(model_path)
    params = state['params'] if 'params' in state else state
    model = SegUnet2D(num_classes=num_classes)
    train_spacing = None if train_spacing is None \
        else np.asarray(train_spacing, np.float64)
    predictor_cache = {}  # jitted tile predictors, one per tile shape

    def segment_fn(volume, nii_affine_or_spacing=None):
        vol = np.asarray(volume, np.float32)
        in_shape = vol.shape
        spacing = _spacing_from(nii_affine_or_spacing)
        respace = (spacing is not None and train_spacing is not None
                   and not np.allclose(spacing, train_spacing, rtol=0.05))
        if respace:
            net_shape = tuple(
                max(1, int(round(s * sp / tsp)))
                for s, sp, tsp in zip(in_shape, spacing, train_spacing))
            vol = np.asarray(jax.image.resize(
                jnp.asarray(vol), net_shape, 'linear'))
        vol = (vol - vol.mean()) / max(vol.std(), 1e-8)
        preds = []
        for d in range(vol.shape[0]):
            logits = sliding_window_logits_2d(
                model.apply, params, vol[d], num_classes, tile_size, mirror_tta,
                predictor_cache=predictor_cache)
            preds.append(np.argmax(logits, axis=-1))
        pred = np.stack(preds).astype(np.int32)
        if respace:
            pred = np.asarray(jax.image.resize(
                jnp.asarray(pred), in_shape, 'nearest'))
        if extra_permute:
            pred = np.transpose(pred, (0, 2, 1))
        return pred

    return segment_fn
