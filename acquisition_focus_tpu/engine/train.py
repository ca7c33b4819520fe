"""Jitted training and evaluation steps.

One compiled ``train_step`` covers the whole hot path of the reference's
``model_step``/``epoch_iter`` (/root/reference/acquisition_focus/running/
run_dl.py:238-489), re-structured for XLA:

* all per-view Python loops become a folded view x batch leading axis with static
  view counts per stage (recompiled per stage, which is cheap and exact);
* the reference's requires_grad flipping per stage (run_dl.py:116-123) becomes
  ``stop_gradient`` placement + a per-view gradient mask over the stacked ATM params;
* gradient accumulation is a ``lax.scan`` over microbatches inside the step
  (mean of per-microbatch gradients — equal to the reference's loss/accum_steps sum,
  run_dl.py:444-451);
* both optimizers update inside the same compiled step.
"""

import dataclasses
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from acquisition_focus_tpu.engine.losses import binarize_onehot, dice_ce_loss
from acquisition_focus_tpu.engine.metrics import dice_per_class
from acquisition_focus_tpu.models.atm import StackedATMs
from acquisition_focus_tpu.models.hybrid_unet import HybridUnet
from acquisition_focus_tpu.ops.affine import compose
from acquisition_focus_tpu.ops.resample import (
    nifti_grid_sample, nifti_grid_sample_nodiff, resize_trilinear)
from acquisition_focus_tpu.ops.rotations import random_affine_batch


@dataclasses.dataclass(frozen=True)
class StageSpec:
    """Static stage description — everything that shapes the traced program."""
    n_views: int
    num_classes: int
    n_active_views: int
    view_optimization_mode: str          # opt-all | opt-current-fix-previous | opt-none
    use_affine_theta: bool
    use_binarized_labels: bool = False
    optimize_lv_only: bool = False
    lv_class: int = 2
    hires_fov_mm: Tuple[float, ...] = (192.0, 192.0, 192.0)
    hires_fov_vox: Tuple[int, ...] = (128, 128, 128)
    slice_fov_mm: Tuple[float, ...] = (192.0, 192.0, 1.5)
    slice_fov_vox: Tuple[int, ...] = (128, 128, 1)
    prescan_fov_mm: Tuple[float, ...] = (192.0, 192.0, 192.0)
    prescan_fov_vox: Tuple[int, ...] = (128, 128, 128)
    optim_method: str = 'R6-vector'
    offset_clip_value: float = 0.2
    zoom_clip_value: float = 0.0
    rotate_slice_to_min_principle: bool = False
    label_slice_type: str = 'from-gt'
    augment_input: bool = True
    augment_recon: bool = False
    augment_strength: float = 1.0
    num_grad_accum_steps: int = 2
    compute_dtype: str = 'bfloat16'
    model_type: str = 'hybrid-unet'
    # rematerialization switches. False (default) = policy remat: save only bf16
    # conv outputs, recompute the f32 norm/activation elementwise in backward (no
    # conv recompute; saving everything OOMs 16GB HBM — measured 21.3GB). True =
    # full recompute of ATM chains / decoder stages (less peak HBM, for bigger
    # volumes/batches).
    atm_remat: bool = False
    unet_remat: bool = False
    # experimental: route qualifying decoder convs (full-res level) through the
    # Pallas direct conv (ops/pallas/conv3d.py). False | True/'fwd' (Pallas
    # forward, XLA gradients) | 'full' (Pallas fwd + dx + wgrad kernels).
    use_pallas_conv3d: object = False
    # checkpoint_name marks the decoder remat policy saves; ('conv_out',
    # 'conv_in', or per-level 'conv_in0'...) additionally stores conv inputs so XLA wgrad reads a
    # saved activation instead of a recompute-fusion product. Saving dec0's
    # inputs (the 128^3 level) measured 1.8205 vs 1.8317 s/step on v5e at
    # batch 2 x accum 2 (PERF.md round 4); batch 4 x accum 1 with the same
    # save list fails to execute (HBM).
    decoder_save_names: Tuple[str, ...] = ('conv_out', 'conv_in0')
    # model width plan (reference widths by default). The multi-chip dryrun uses
    # skinny widths: identical program/sharding structure, ~50x fewer FLOPs.
    base_features: Tuple[int, ...] = (16, 32, 64, 128, 256, 256)
    locnet_width: int = 32
    # theta-refresh cadence (config `theta_refresh_every` > 1): 'locnet' runs
    # and trains the localization nets per step (reference behavior); 'cached'
    # takes per-sample thetas precomputed by `theta_pass` from the batch and
    # traces NO locnet at all — the single largest step-time bucket (561 ms of
    # 1.82 s at the default workload, PERF.md) vanishes from those steps.
    theta_source: str = 'locnet'

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == 'bfloat16' else jnp.float32

    def view_train_mask(self):
        """(n_active_views,) bool: which views' thetas receive gradients."""
        mask = np.zeros(self.n_active_views, bool)
        if not self.use_affine_theta or self.theta_source == 'cached':
            return mask
        if self.view_optimization_mode == 'opt-all':
            mask[:] = True
        elif self.view_optimization_mode == 'opt-current-fix-previous':
            mask[-1] = True
        return mask


def make_models(spec: StageSpec):
    if spec.model_type in ('hybrid-EPix2Vox', 'hybrid-Pix2Vox'):
        from acquisition_focus_tpu.models.epix2vox import EPix2VoxModel128
        recon = EPix2VoxModel128(n_views=spec.n_views,
                                 use_epix2vox=spec.model_type == 'hybrid-EPix2Vox')
    else:
        recon = HybridUnet(n_views=spec.n_views, num_classes=spec.num_classes,
                           base_features=tuple(spec.base_features),
                           dtype=spec.dtype, remat_skips=spec.unet_remat,
                           use_pallas_conv=spec.use_pallas_conv3d,
                           decoder_save_names=tuple(spec.decoder_save_names))
    unet = recon
    atms = StackedATMs(
        n_views=spec.n_views, optim_method=spec.optim_method,
        prescan_spat=spec.prescan_fov_vox[0],
        offset_clip_value=spec.offset_clip_value,
        zoom_clip_value=spec.zoom_clip_value, dtype=spec.dtype,
        locnet_width=spec.locnet_width)
    return unet, atms


def init_params(spec: StageSpec, rng_key, batch_size=1):
    """Initialize both models' params as ONE jitted program: eager flax init runs
    every layer's RNG/conv as its own dispatch (~650 tiny compiles, minutes of
    wall-clock through the axon tunnel)."""
    return _init_params_jit(spec, rng_key, batch_size)


@partial(jax.jit, static_argnums=(0, 2))
def _init_params_jit(spec: StageSpec, rng_key, batch_size):
    unet, atms = make_models(spec)
    k1, k2 = jax.random.split(rng_key)
    S = spec.hires_fov_vox[0]
    P = spec.prescan_fov_vox[0]
    if spec.model_type in ('hybrid-EPix2Vox', 'hybrid-Pix2Vox'):
        views = jnp.zeros((batch_size, spec.n_views, 224, 224, 3))
        unet_params = unet.init(k1, views)
    else:
        x = jnp.zeros((batch_size, spec.n_views * spec.num_classes, S, S))
        affs = jnp.broadcast_to(jnp.eye(4), (spec.n_views, batch_size, 4, 4))
        unet_params = unet.init(k1, x, affs)
    xp = jnp.zeros((spec.n_views, batch_size, P, P, P, spec.num_classes))
    atm_params = atms.init(k2, xp)
    return unet_params, atm_params


def _fold(x):
    """(V, B, ...) -> (V*B, ...)"""
    return x.reshape((-1,) + x.shape[2:])


def prescan_kernel_in_scale(spec: StageSpec) -> bool:
    """Whether the prescan resample's affine scale fits the Pallas volume
    kernel's static bbox (~1.4 source voxels per output voxel): the static FOV
    ratio (e.g. 4x for 6mm/32-cube prescans from the 1.5mm hires volume) times
    the worst-case augmentation zoom. random_affine draws zoom uniform in
    1 +- zoom_strength/2 (ops/rotations.py:107) and extract_view_slices passes
    zoom_strength = 0.2*augment_strength, so the worst factor is
    1 + 0.1*augment_strength. This static guard avoids even compiling the
    kernel for configs that can never fit; in-scale configs additionally carry
    a RUNTIME affine check with a gather fallback inside the jitted step
    (nifti_grid_sample_nodiff -> kernel_scale_fits)."""
    fov_ratio = max(
        (pm / pv) / (hm / hv)
        for pm, pv, hm, hv in zip(spec.prescan_fov_mm, spec.prescan_fov_vox,
                                  spec.hires_fov_mm, spec.hires_fov_vox))
    max_zoom = 1.0 + 0.1 * (spec.augment_strength if spec.augment_input else 0.0)
    return fov_ratio * max_zoom <= 1.4


def _active_atm_params(atm_params, n_active):
    return jax.tree_util.tree_map(lambda p: p[:n_active], atm_params)


def compute_thetas(spec: StageSpec, atm_params, soft_label, nii_affine,
                   view_affines):
    """Prescan resample + localization nets -> (A, B, 4, 4) learned corrections.

    Factored out of ``extract_view_slices`` so the theta-refresh cadence
    (``theta_refresh_every`` > 1) can snapshot every sample's thetas in one
    cheap forward-only pass: between transform-optimizer updates the locnet
    params are constant, so for a fixed (sample, view_affine) the theta is
    exactly constant too — recomputing it per step (as the reference does,
    learnable_transform.py:248-270) buys nothing on non-update steps."""
    A = spec.n_active_views
    B, C = soft_label.shape[0], soft_label.shape[1]
    # 1) no-grad resample of the soft label into each view's prescan frame —
    #    the localization net input (reference learnable_transform.py:248-255).
    #    All A view affines share the (never duplicated) volume; the resample
    #    runs in the compute dtype through the forward-only fast path (Pallas
    #    bbox-DMA kernel on TPU) — this input only feeds the (bf16)
    #    localization convs under stop_gradient. The kernel's static bbox
    #    covers affine scales up to ~1.4 source voxels per output voxel; the
    #    prescan affine's scale is the static FOV ratio (e.g. 4x for 6mm/32³
    #    prescans from the 1.5mm hires volume) times the augmentation zoom
    #    (1 + 0.2*strength). Out-of-range configs fall back to the exact
    #    gather path.
    sample_fn = (nifti_grid_sample_nodiff if prescan_kernel_in_scale(spec)
                 else nifti_grid_sample)
    prescan, _, _ = sample_fn(
        jax.lax.stop_gradient(soft_label.astype(spec.dtype)), nii_affine,
        jnp.asarray(spec.prescan_fov_mm), spec.prescan_fov_vox,
        is_label=False,
        pre_grid_sample_affine=jax.lax.stop_gradient(_fold(view_affines)))
    prescan = jax.lax.stop_gradient(prescan)  # stays in compute dtype
    P = spec.prescan_fov_vox
    prescan = jnp.transpose(prescan, (0, 2, 3, 4, 1)).reshape(
        (A, B) + tuple(P) + (C,))

    # 2) stacked localization nets -> constrained thetas (per-view loop:
    #    measured 3x faster than the vmapped grouped-conv lowering, PERF.md)
    from acquisition_focus_tpu.models.atm import apply_stacked_atms
    return apply_stacked_atms(
        _active_atm_params(atm_params, A), prescan,
        optim_method=spec.optim_method,
        prescan_spat=spec.prescan_fov_vox[0],
        offset_clip_value=spec.offset_clip_value,
        zoom_clip_value=spec.zoom_clip_value, dtype=spec.dtype,
        remat=spec.atm_remat, locnet_width=spec.locnet_width,
        # structural per-view stop_gradient: frozen views' locnet backward
        # is never traced (the where-mask in the caller only zeroes it at
        # runtime)
        train_mask=spec.view_train_mask())


def extract_view_slices(spec: StageSpec, atms, atm_params, soft_label, nii_affine,
                        view_affines, augment_rng=None, image=None,
                        cached_thetas=None):
    """Produce per-view model-input slices along learned view planes.

    Args:
      soft_label: (B, C, D, H, W) float one-hot label volume (centroid-reoriented).
      nii_affine: (B, 4, 4) of that volume.
      view_affines: (A, B, 4, 4) input grid affines for the A *active* views
        (inv(base) @ clinical view affine — reference run_dl.py:227-234).
      augment_rng: optional key -> per-sample input-orientation augmentation
        (shared across views, reference run_dl.py:208-223,274-279).
      cached_thetas: (A, B, 4, 4) precomputed per-sample thetas; when
        ``spec.theta_source == 'cached'`` these replace the prescan+locnet
        computation entirely (theta-refresh cadence).

    Returns: (slices (A, B, C, Sh, Sw), grid_affines (A, B, 4, 4),
              out_nii_affines (A, B, 4, 4), thetas (A, B, 4, 4))
    """
    A = spec.n_active_views
    B, C = soft_label.shape[0], soft_label.shape[1]

    if augment_rng is not None:
        aug = random_affine_batch(
            augment_rng, B,
            rotation_strength=0.1 * spec.augment_strength,
            zoom_strength=0.2 * spec.augment_strength,
            offset_strength=0.0)
        view_affines = compose(view_affines, aug[None])

    if spec.use_affine_theta and spec.theta_source == 'cached':
        # theta cadence: thetas were snapshotted by theta_pass after the last
        # transform update; the locnet is neither run nor differentiated here.
        # Note the cache was computed from the UNAUGMENTED view orientation —
        # the slicing below still sees the augmented orientation, the learned
        # correction just doesn't react to the augmentation draw.
        thetas = jax.lax.stop_gradient(cached_thetas.astype(jnp.float32))
    elif spec.use_affine_theta:
        thetas = compute_thetas(spec, atm_params, soft_label, nii_affine,
                                view_affines)
    else:
        thetas = jnp.broadcast_to(jnp.eye(4), (A, B, 4, 4)).astype(jnp.float32)

    # per-view trainability: gradient flows only through unmasked views' thetas
    mask = jnp.asarray(spec.view_train_mask())[:, None, None, None]
    thetas = jnp.where(mask, thetas, jax.lax.stop_gradient(thetas))

    # 3) differentiable slicing of the soft label along view_affine @ theta
    pre = compose(view_affines, thetas)
    slices, grid_affines, out_nii = nifti_grid_sample(
        soft_label, nii_affine,
        jnp.asarray(spec.slice_fov_mm), spec.slice_fov_vox,
        is_label=False, pre_grid_sample_affine=_fold(pre))

    if spec.rotate_slice_to_min_principle:
        # constrain the output by aligning each slice's in-plane min-inertia axis
        # (reference learnable_transform.py:315-333,337-366)
        from acquisition_focus_tpu.geometry.moments import (
            slice_min_principal_align_affines)
        slice_lbl = jnp.argmax(slices, axis=1)
        align = jax.lax.stop_gradient(
            slice_min_principal_align_affines(slice_lbl)).astype(jnp.float32)
        slices, _, out_nii = nifti_grid_sample(
            slices, out_nii.astype(jnp.float32),
            is_label=False, pre_grid_sample_affine=align)
        grid_affines = compose(grid_affines, align)

    Sh, Sw = spec.slice_fov_vox[0], spec.slice_fov_vox[1]
    slices = slices.reshape(A, B, C, Sh, Sw, spec.slice_fov_vox[2])[..., 0]
    if (Sh, Sw) != tuple(spec.hires_fov_vox[:2]):
        # upsample to hires in-plane resolution (reference run_dl.py:193-197)
        target = tuple(spec.hires_fov_vox[:2]) + (1,)
        up = resize_trilinear(_fold(slices)[..., None], target)[..., 0]
        slices = up.reshape((A, B, C) + tuple(spec.hires_fov_vox[:2]))

    grid_affines = grid_affines.reshape(A, B, 4, 4)
    out_nii = out_nii.reshape(A, B, 4, 4)

    image_slices = None
    if image is not None:
        img_slc, _, _ = nifti_grid_sample(
            jax.lax.stop_gradient(image)[:, None], nii_affine,
            jnp.asarray(spec.slice_fov_mm), spec.slice_fov_vox,
            is_label=False,
            pre_grid_sample_affine=jax.lax.stop_gradient(_fold(pre)))
        image_slices = img_slc.reshape(
            A, B, 1, spec.slice_fov_vox[0], spec.slice_fov_vox[1])

    return slices, grid_affines, out_nii, thetas, image_slices


def assemble_model_input(spec: StageSpec, slices, grid_affines, augment_rng=None):
    """Duplicate the current view to fill missing views and stack into the model
    input (reference run_dl.py:318-329); optional reconstruction-side augmentation."""
    A, V = spec.n_active_views, spec.n_views
    idx = list(range(A)) + [A - 1] * (V - A)
    slices = slices[jnp.asarray(idx)]
    grid_affines = grid_affines[jnp.asarray(idx)]

    if augment_rng is not None:
        B = slices.shape[1]
        aug = random_affine_batch(
            augment_rng, B,
            rotation_strength=0.1 * spec.augment_strength,
            zoom_strength=0.2 * spec.augment_strength,
            offset_strength=0.0)
        grid_affines = compose(grid_affines, aug[None])

    b_input = jnp.concatenate([slices[v] for v in range(V)], axis=1)
    return b_input, grid_affines


def _segment_slices_in_jit(spec: StageSpec, seg_model, seg_params, image_slices,
                           train_spacing_mm=1.5):
    """Replace label slices by segmenting the *image* slices inside the jitted
    eval step (reference run_dl.py:172-188: from-segmented, phase != train).

    Semantics vs the serving segmenter (engine/segmenter.py), kept equivalent
    where the shapes allow and documented where they deviate:

    * z-normalization is per slice (each slice is one segmenter input, matching
      run_inference_on_image's per-image norm, reference nnunetv2_utils.py:97);
    * the slice is respaced to the segmenter's 1.5 mm training grid before
      inference (reference segment_fn respaces from get_zooms(atm_nii_affine),
      run_dl.py:178; nnunetv2_utils.py:61-115). Jit needs static shapes, so the
      respacing factor comes from the static spec FOVs — exact when
      zoom_clip_value == 0 (the default), approximate under learned zoom;
    * mirror TTA averages the 2^2 in-plane flips exactly like
      segmenter.make_tile_predictor. Sliding window + gaussian blending are
      omitted because after respacing the slice is a single tile (<= 128^2 at
      every shipped config), where they degenerate to one plain apply
      (acc/norm = logits*g / g);
    * the prediction is one-hot at the respaced resolution and resampled
      trilinear straight to the hires in-plane grid — the reference instead
      round-trips nearest back to slice resolution first (run_dl.py:180-197),
      which only loses fidelity; deviation noted in PARITY.md.

    Args:  image_slices (A, B, 1, sh, sw) at slice_fov_vox resolution.
    Returns: (A, B, num_classes, Hh, Hw) one-hot slices at hires resolution.
    """
    A, B = image_slices.shape[0], image_slices.shape[1]
    sh, sw = spec.slice_fov_vox[0], spec.slice_fov_vox[1]
    x = image_slices.reshape(A * B, sh, sw, 1)

    sp_h = spec.slice_fov_mm[0] / sh
    sp_w = spec.slice_fov_mm[1] / sw
    nh = max(1, int(round(sh * sp_h / train_spacing_mm)))
    nw = max(1, int(round(sw * sp_w / train_spacing_mm)))
    if (nh, nw) != (sh, sw):
        x = jax.image.resize(x, (A * B, nh, nw, 1), 'linear')

    mu = x.mean(axis=(1, 2), keepdims=True)
    sd = x.std(axis=(1, 2), keepdims=True)
    x = (x - mu) / jnp.maximum(sd, 1e-8)

    logits = seg_model.apply(seg_params, x)
    for axes in ((1,), (2,), (1, 2)):
        logits = logits + jnp.flip(
            seg_model.apply(seg_params, jnp.flip(x, axes)), axes)
    logits = logits / 4.0

    pred = jnp.argmax(logits, axis=-1)                      # (A*B, nh, nw)
    onehot = jax.nn.one_hot(pred, spec.num_classes, dtype=jnp.float32)
    slc = jnp.transpose(onehot, (0, 3, 1, 2))               # (A*B, C, nh, nw)
    Hh, Hw = spec.hires_fov_vox[0], spec.hires_fov_vox[1]
    if (nh, nw) != (Hh, Hw):
        slc = resize_trilinear(slc[..., None], (Hh, Hw, 1))[..., 0]
    return slc.reshape(A, B, spec.num_classes, Hh, Hw)


def forward(spec: StageSpec, unet, unet_params, atms, atm_params, batch, rng,
            train: bool, seg_model=None, seg_params=None):
    """Full forward: volumes -> view slices -> reconstruction -> loss.

    When ``spec.label_slice_type == 'from-segmented'`` and a frozen segmenter is
    given, validation/test slices come from segmenting the *image* slice instead of
    the ground-truth label slice (reference run_dl.py:170-188)."""
    label = batch['label']              # (B, D, H, W) int
    nii_affine = batch['nii_affine']    # (B, 4, 4)
    view_affines = batch['view_affines'][:spec.n_active_views]  # (A, B, 4, 4)

    onehot = jax.nn.one_hot(label, spec.num_classes, axis=1, dtype=jnp.float32)
    soft_label = onehot

    aug_in = None
    aug_recon = None
    if rng is not None:
        k_in, k_re = jax.random.split(rng)
        aug_in = k_in if spec.augment_input else None
        aug_recon = k_re if spec.augment_recon else None

    use_segmenter = (spec.label_slice_type == 'from-segmented' and not train
                     and seg_model is not None)
    slices, grid_affines, out_nii, thetas, image_slices = extract_view_slices(
        spec, atms, atm_params, soft_label, nii_affine, view_affines, aug_in,
        image=batch.get('image') if use_segmenter else None,
        cached_thetas=batch.get('thetas'))

    if use_segmenter:
        slices = _segment_slices_in_jit(spec, seg_model, seg_params, image_slices)
    b_input, grid_affines_full = assemble_model_input(
        spec, slices, grid_affines, aug_recon)

    if spec.model_type in ('hybrid-EPix2Vox', 'hybrid-Pix2Vox'):
        # (E)Pix2Vox path: binary fg views in, occupancy out as bg/fg stack
        # (reference interface_models.py:5-21, run_dl.py:362-364)
        from acquisition_focus_tpu.models.epix2vox import (
            epix2vox_interface_input, epix2vox_interface_output)
        views = epix2vox_interface_input(b_input, spec.n_views)
        occupancy = unet.apply(unet_params, views)
        logits = epix2vox_interface_output(occupancy)
    else:
        logits = unet.apply(unet_params, b_input, grid_affines_full)

    target = onehot
    y_hat = logits
    if spec.use_binarized_labels:
        target = binarize_onehot(target)
        y_hat = binarize_onehot(y_hat)

    if spec.optimize_lv_only:
        sel = jnp.asarray([0, spec.lv_class])
        loss = dice_ce_loss(y_hat[:, sel], target[:, sel])
    else:
        loss = dice_ce_loss(y_hat, target)

    aux = {
        'logits': y_hat,
        'target_onehot': target,
        'grid_affines': grid_affines_full,
        'out_nii_affines': out_nii,
        'thetas': thetas,
        'b_input': b_input,
    }
    return loss, aux


def _metrics_from_logits(spec, logits, target_onehot):
    from acquisition_focus_tpu.ops.channel_ops import channel_argmax
    pred = channel_argmax(logits)   # axis-1 argmax unrolled (PERF.md)
    num_eval = 2 if spec.use_binarized_labels else spec.num_classes
    pred_oh = jax.nn.one_hot(pred, num_eval, axis=1, dtype=jnp.float32)
    dice = dice_per_class(pred_oh, target_onehot)
    return pred.astype(jnp.int32), dice


@partial(jax.jit, static_argnames=('spec', 'unet', 'atms', 'recon_opt', 'trans_opt'),
         donate_argnums=(5, 6, 7, 8))
def train_step(spec: StageSpec, unet, atms, recon_opt, trans_opt,
               unet_params, atm_params, recon_opt_state, trans_opt_state,
               batch, rng):
    """One optimizer update over num_grad_accum_steps microbatches.

    batch leaves have leading (accum, B, ...). Returns new params/opt states and
    per-microbatch metrics.
    """
    accum = spec.num_grad_accum_steps

    def loss_fn(params, micro, key):
        u_p, a_p = params
        loss, aux = forward(spec, unet, u_p, atms, a_p, micro, key, train=True)
        return loss, aux

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def scan_body(carry, inp):
        grads_acc, _ = carry
        micro, key = inp
        (loss, aux), grads = grad_fn((unet_params, atm_params), micro, key)
        grads_acc = jax.tree_util.tree_map(lambda a, g: a + g / accum, grads_acc, grads)
        # dice only: dense predictions are an eval_step concern — returning them
        # from train_step materializes (accum, B, S^3) int32 per step that every
        # caller discards (and jit outputs cannot be DCEd)
        _, dice = _metrics_from_logits(spec, aux['logits'], aux['target_onehot'])
        return (grads_acc, None), (loss, dice)

    zero_grads = jax.tree_util.tree_map(
        jnp.zeros_like, (unet_params, atm_params))
    keys = jax.random.split(rng, accum)
    micro_batches = batch  # leaves already (accum, B, ...)
    (grads, _), (losses, dices) = jax.lax.scan(
        scan_body, (zero_grads, None), (micro_batches, keys))

    unet_grads, atm_grads = grads

    # Per-view gradient mask on the stacked ATM params: only the trainable views of
    # this stage step (replaces requires_grad flipping, reference run_dl.py:116-123).
    full_mask = np.zeros(spec.n_views, bool)
    full_mask[:spec.n_active_views] = spec.view_train_mask()
    mask_arr = jnp.asarray(full_mask)

    def mask_grad(g):
        m = mask_arr.reshape((spec.n_views,) + (1,) * (g.ndim - 1))
        return jnp.where(m, g, 0.0)

    atm_grads = jax.tree_util.tree_map(mask_grad, atm_grads)

    unet_updates, recon_opt_state = recon_opt.update(
        unet_grads, recon_opt_state, unet_params)
    unet_params = optax.apply_updates(unet_params, unet_updates)

    if bool(full_mask.any()):
        atm_updates, trans_opt_state = trans_opt.update(
            atm_grads, trans_opt_state, atm_params)
        # mask the *updates* too: AdamW's decoupled weight decay must not erode
        # frozen views' weights (the reference optimizer only ever sees the current
        # view's params, run_dl.py:125-129)
        atm_updates = jax.tree_util.tree_map(mask_grad, atm_updates)
        atm_params = optax.apply_updates(atm_params, atm_updates)

    metrics = {'loss': losses.mean(), 'dice': dices.reshape(-1, dices.shape[-1])}
    return (unet_params, atm_params, recon_opt_state, trans_opt_state,
            metrics, None)


@partial(jax.jit, static_argnames=('spec',))
def theta_pass(spec: StageSpec, atm_params, batch):
    """Snapshot every sample's learned view corrections: (A, B, 4, 4).

    Forward-only, UNAUGMENTED, no gradients — used by the theta-refresh
    cadence to fill the per-sample theta cache after each transform-optimizer
    update window. Must be called with a spec whose theta_source is 'locnet'
    (the cached spec would have nothing to compute)."""
    label = batch['label']
    onehot = jax.nn.one_hot(label, spec.num_classes, axis=1, dtype=jnp.float32)
    view_affines = batch['view_affines'][:spec.n_active_views]
    return jax.lax.stop_gradient(compute_thetas(
        spec, atm_params, onehot, batch['nii_affine'], view_affines))


@partial(jax.jit, static_argnames=('spec', 'unet', 'atms', 'with_aug', 'seg_model'))
def eval_step(spec: StageSpec, unet, atms, unet_params, atm_params, batch, rng,
              with_aug=False, seg_model=None, seg_params=None):
    """Forward-only step; returns loss, per-class dice, dense predictions, and the
    view geometry artifacts (thetas, slice affines) for logging/output."""
    loss, aux = forward(spec, unet, unet_params, atms, atm_params, batch,
                        rng if with_aug else None, train=False,
                        seg_model=seg_model, seg_params=seg_params)
    pred, dice = _metrics_from_logits(spec, aux['logits'], aux['target_onehot'])
    return {
        'loss': loss,
        'dice': dice,
        'pred': pred,
        'thetas': aux['thetas'],
        'grid_affines': aux['grid_affines'],
        'out_nii_affines': aux['out_nii_affines'],
        'b_input': aux['b_input'],
    }
