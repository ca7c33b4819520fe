"""Run orchestration: epoch loops, metric cadence, checkpointing, stage hand-off.

Capability port of the reference training engine ``run_dl``/``epoch_iter``
(/root/reference/acquisition_focus/running/run_dl.py:394-735), with the hot path
fully inside the jitted ``train_step``/``eval_step`` of engine.train and only
per-epoch bookkeeping on the host.
"""

import dataclasses
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from acquisition_focus_tpu.engine.checkpoint import (
    checkpoint_exists, load_checkpoint, save_checkpoint)
from acquisition_focus_tpu.engine.metrics import (
    accumulate_label_scores, hausdorff_per_class, hausdorff_per_class_device,
    iou_per_class_labels, reduce_label_scores)
from acquisition_focus_tpu.engine.optimizers import (
    make_reconstruction_optimizer, make_transform_optimizer)
from acquisition_focus_tpu.engine.train import (
    StageSpec, eval_step, init_params, make_models, theta_pass, train_step)
from acquisition_focus_tpu.parallel.mesh import (
    make_mesh, replicate, shard_batch, shard_opt_state, shard_params)
from acquisition_focus_tpu.geometry.clinical_views import get_class_volumes
from acquisition_focus_tpu.ops.affine import affine_zooms
from acquisition_focus_tpu.utils.logging import RunLogger, get_global_idx


def spec_from_config(config, num_classes, n_active_views, phase='train'):
    """Build the static StageSpec for a phase from the merged stage config."""
    aug_on = phase in config.get('aug_phases', ['train', 'val'])
    return StageSpec(
        n_views=len(config['base_views']),
        num_classes=num_classes,
        n_active_views=n_active_views,
        view_optimization_mode=config['view_optimization_mode'],
        use_affine_theta=config['use_affine_theta'],
        use_binarized_labels=config.get('use_binarized_labels', False),
        optimize_lv_only=config.get('optimize_lv_only', False),
        hires_fov_mm=tuple(config['hires_fov_mm']),
        hires_fov_vox=tuple(config['hires_fov_vox']),
        slice_fov_mm=tuple(config['slice_fov_mm']),
        slice_fov_vox=tuple(config['slice_fov_vox']),
        prescan_fov_mm=tuple(config['prescan_fov_mm']),
        prescan_fov_vox=tuple(config['prescan_fov_vox']),
        optim_method=config['affine_theta_optim_method'],
        offset_clip_value=config['offset_clip_value'],
        zoom_clip_value=config['zoom_clip_value'],
        rotate_slice_to_min_principle=config.get(
            'rotate_slice_to_min_principle', False),
        label_slice_type=config.get('label_slice_type', 'from-gt'),
        augment_input=config.get('do_augment_input_orientation', True) and aug_on,
        augment_recon=config.get('do_augment_recon_orientation', False) and aug_on,
        augment_strength=config.get('sample_augment_strength', 1.0),
        num_grad_accum_steps=config['num_grad_accum_steps'],
        compute_dtype=config.get('compute_dtype', 'bfloat16'),
        model_type=config.get('model_type', 'hybrid-unet'),
        atm_remat=config.get('atm_remat', False),
        unet_remat=config.get('unet_remat', False),
        use_pallas_conv3d=config.get('use_pallas_conv3d', False),
        # only a MISSING key falls back — an explicitly-empty list is a valid
        # 'save nothing, recompute everything' policy and must not be coerced
        # to the most memory-hungry default (round-4 advisor item)
        decoder_save_names=tuple(
            config['decoder_save_names']
            if config.get('decoder_save_names') is not None
            else ('conv_out', 'conv_in0')),
        base_features=tuple(config.get('base_features')
                            or (16, 32, 64, 128, 256, 256)),
        locnet_width=int(config.get('locnet_width') or 32),
    )


def n_active_views_for(config):
    if 'n_active_views' in config and config['n_active_views'] is not None:
        return int(config['n_active_views'])
    return len(config['base_views'])


def _to_device(batch):
    return jax.tree_util.tree_map(jnp.asarray, batch)


def _unflatten_like(template, leaves):
    """Rebuild a structured pytree (e.g. an optax state with its NamedTuple
    containers) from checkpointed plain leaves, using a freshly-initialized
    state of identical structure as the treedef donor."""
    treedef = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(l) for l in leaves])


def _heavy_metric_epoch(config, epx):
    return ((epx % config.get('metrics_every', 20) == 0 and epx > 0)
            or (epx + 1 == config['epochs']) or config.get('debug', False)
            or bool(config.get('test_only_and_output_to')))


def run_dl(base_dir, config, fold_properties, stage=None, training_dataset=None,
           test_dataset=None, run_test_once_only=False, run_name='run'):
    """Train one stage on one fold. Returns the best save path (if any)."""
    fold_idx, (train_idxs, val_idxs) = fold_properties
    num_classes = len(training_dataset.label_tags) if training_dataset \
        else len(test_dataset.label_tags)
    n_active = n_active_views_for(config)

    logger = RunLogger(config.get('log_dir', 'data/runs'), run_name,
                       config.get('wandb_mode', 'disabled'), config)

    specs = {p: spec_from_config(config, num_classes, n_active, p)
             for p in ('train', 'val', 'test')}
    spec = specs['train']
    unet, atms = make_models(spec)

    # params init (reference run_dl.py:641-650)
    rng = jax.random.key(config.get('seed', 0))
    unet_params, atm_params = init_params(spec, rng, batch_size=1)

    n_params = sum(p.size for p in jax.tree_util.tree_leaves(unet_params))
    print(f"Reconstruction model params: {n_params / 1e6:.2f}M; "
          f"stage active views: {n_active}/{spec.n_views}")

    # optimizers (fresh per stage, like the reference's per-run factories)
    B = config['batch_size']
    accum = config['num_grad_accum_steps']
    updates_per_epoch = max(1, len(train_idxs) // (B * accum))
    if config.get('model_type') in ('hybrid-EPix2Vox', 'hybrid-Pix2Vox'):
        from acquisition_focus_tpu.engine.optimizers import make_epix2vox_optimizer
        recon_opt = make_epix2vox_optimizer(
            updates_per_epoch, config.get('use_scheduling', True))
    else:
        recon_opt = make_reconstruction_optimizer(
            config['lr'], updates_per_epoch, config.get('use_scheduling', True))
    trans_opt = make_transform_optimizer(
        config['lr'], config['epochs'], updates_per_epoch,
        config.get('use_scheduling', True))
    recon_state = recon_opt.init(unet_params)
    trans_state = trans_opt.init(atm_params)

    # full-state checkpoint restore: params, both optimizer states (incl. their
    # count-based schedules), best-val quality, epoch — so a resumed run continues
    # with the exact LR/moments and cannot clobber the previous best snapshot
    # (reference saves model+optimizers+scheduler+scaler, run_dl.py:704-713)
    epx_start = 0
    best_quality = float('inf')
    mdl_chk = config.get('model_checkpoint_path')
    if mdl_chk and checkpoint_exists(mdl_chk):
        ck = load_checkpoint(mdl_chk)
        unet_params = ck['unet_params']
        atm_params = ck['atm_params']
        if 'recon_opt_leaves' in ck:
            recon_state = _unflatten_like(recon_state, ck['recon_opt_leaves'])
            trans_state = _unflatten_like(trans_state, ck['trans_opt_leaves'])
        if 'best_quality' in ck:
            best_quality = float(ck['best_quality'])
        epx_start = int(ck.get('epoch', -1)) + 1
        print(f"Loaded checkpoint from {mdl_chk} (resuming at epoch {epx_start})")
    trans_chk = config.get('transform_model_checkpoint_path')
    if trans_chk and checkpoint_exists(trans_chk):
        ck = load_checkpoint(trans_chk)
        atm_params = ck['atm_params']
        print(f"Loaded transform checkpoint from {trans_chk}")

    # multi-chip: shard params/batches over the configured device mesh; XLA's SPMD
    # partitioner inserts the collectives (new capability vs the reference's
    # single-GPU loop, main_acquisition_focus.py:13-14)
    mesh = make_mesh(config.get('mesh_shape'))
    if mesh is not None:
        data_size = mesh.shape.get('data', 1)
        assert B % data_size == 0, (
            f"batch_size {B} must be divisible by the data mesh axis {data_size}")
        unet_params, atm_params = shard_params(unet_params, atm_params, mesh)
        # Adam mu/nu mirror the param shapes: shard them with the params (the
        # optimizer state is 2x the param bytes — replicating it dominates
        # per-chip memory); transform opt state follows the replicated ATMs
        recon_state = shard_opt_state(recon_state, mesh)
        trans_state = replicate(trans_state, mesh)
        print(f"Training on mesh {dict(mesh.shape)} ({mesh.size} devices)")

    def put_batch(batch, train):
        if mesh is not None:
            bsz = batch['label'].shape[1] if train else batch['label'].shape[0]
            if bsz % mesh.shape.get('data', 1) == 0:
                return shard_batch(batch, mesh, train=train)
        return _to_device(batch)

    best_save_path = None
    seed = config.get('seed', 0)

    # theta-refresh cadence (`theta_refresh_every` = k > 1): locnets run and
    # train per step only every k-th epoch; in between, each sample's theta is
    # a cached constant snapshotted by theta_pass after the last update epoch
    # (exact while the transform params are frozen — train.compute_thetas).
    # The cached-theta step traces no locnet at all (561 ms of the 1.82 s
    # default step, PERF.md). Cache is derivable state: a resume just
    # re-snapshots at its first non-refresh epoch.
    theta_every = int(config.get('theta_refresh_every', 1) or 1)
    use_theta_cache = (theta_every > 1 and spec.use_affine_theta
                      and bool(spec.view_train_mask().any())
                      and not run_test_once_only)
    spec_cached = dataclasses.replace(spec, theta_source='cached') \
        if use_theta_cache else None
    theta_cache = {}

    def refresh_theta_cache(params):
        for t_sel, t_batch in training_dataset.iterate_eval_batches(
                train_idxs, 1):
            th = np.asarray(theta_pass(specs['train'], params,
                                       put_batch(t_batch, train=False)))
            theta_cache[t_sel[0]] = th[:, 0]   # (A, 4, 4)

    def thetas_for(sel, accum_, B_):
        th = np.stack([theta_cache[sid] for sid in sel])   # (accum*B, A, 4, 4)
        th = th.reshape(accum_, B_, *th.shape[1:])
        return np.ascontiguousarray(th.transpose(0, 2, 1, 3, 4))  # (accum,A,B,4,4)

    out_dir = Path(base_dir) / 'data/output' / run_name

    seg_model, seg_params = _load_segmenter(config, num_classes)

    # stop_at_epoch pauses a run early WITHOUT changing the schedules (which are
    # functions of the full config['epochs']); a pause checkpoint is force-saved
    # at the stop epoch so resuming from it continues bit-exactly regardless of
    # the save_every cadence. stop_at_epoch=0 means "run zero epochs", not "off".
    stop_at = config.get('stop_at_epoch')
    stop_epoch = stop_at if stop_at is not None else config['epochs']

    for epx in range(epx_start, stop_epoch):
        global_idx = get_global_idx(fold_idx, epx, config['epochs'])
        logger.log({'ref_epoch_idx': epx}, step=global_idx)
        epoch_t0 = time.time()
        # epoch-keyed shuffling: deterministic regardless of where the run
        # (re)started, so train(n) == train(k) + resume(n-k) exactly
        data_rng = np.random.default_rng(
            (seed + 1) * 1_000_003 + fold_idx * 1009 + epx)

        if not run_test_once_only:
            # ---- train ----
            refresh_epoch = (not use_theta_cache) or (epx % theta_every == 0)
            if use_theta_cache and not refresh_epoch and not theta_cache:
                refresh_theta_cache(atm_params)   # resume landed mid-cycle
            step_spec = specs['train'] if refresh_epoch else spec_cached
            t_metrics = {}
            losses = []
            n_steps = 0
            for sel, batch in training_dataset.iterate_train_macrobatches(
                    train_idxs, B, accum, data_rng):
                if not refresh_epoch:
                    batch = dict(batch, thetas=thetas_for(sel, accum, B))
                step_key = jax.random.fold_in(
                    jax.random.key(seed), global_idx * 10000 + n_steps)
                (unet_params, atm_params, recon_state, trans_state,
                 metrics, _) = train_step(
                    step_spec, unet, atms, recon_opt, trans_opt,
                    unet_params, atm_params, recon_state, trans_state,
                    put_batch(batch, train=True), step_key)
                losses.append(float(metrics['loss']))
                accumulate_label_scores(
                    t_metrics, 'dice', np.asarray(metrics['dice']),
                    training_dataset.label_tags)
                n_steps += 1
            train_loss = float(np.mean(losses)) if losses else float('nan')
            _log_phase(logger, config, 'train', train_loss, t_metrics, global_idx)

            if use_theta_cache and refresh_epoch:
                # snapshot thetas for the next k-1 cached epochs (the locnet
                # was last updated by this epoch's final step)
                refresh_theta_cache(atm_params)

            # ---- val ----
            val_loss = _eval_phase(
                'val', specs['val'], unet, atms, unet_params, atm_params,
                training_dataset, val_idxs, config, logger, global_idx, epx,
                out_dir=None, seg=(seg_model, seg_params), put_batch=put_batch)
        else:
            train_loss, val_loss = float('nan'), float('nan')

        # ---- test ----
        test_out_dir = config.get('test_only_and_output_to') or None
        _eval_phase('test', specs['test'], unet, atms, unet_params, atm_params,
                    test_dataset, None, config, logger, global_idx, epx,
                    out_dir=test_out_dir, seg=(seg_model, seg_params),
                    put_batch=put_batch)

        epoch_s = time.time() - epoch_t0
        # epoch wall-clock incl. host batching + eval cadence — the BASELINE.json
        # north-star metric; consumed by bench_epoch.py from metrics.jsonl
        perf = {'perf/epoch_s': epoch_s}
        if not run_test_once_only:
            perf['perf/train_slices'] = n_steps * accum * B * spec.n_views
        logger.log(perf, step=global_idx)
        print(f"epoch {epx}: train_loss={train_loss:.4f} val_loss={val_loss:.4f} "
              f"({epoch_s:.1f}s)")

        if run_test_once_only:
            break

        # ---- checkpointing (reference run_dl.py:692-730): full training state —
        # params, both optimizer states (flattened to plain leaf lists so orbax
        # round-trips them without optax's container types), best-val quality ----
        quality = val_loss
        save_every = config.get('save_every')
        ckpt_state = dict(
            unet_params=unet_params, atm_params=atm_params,
            recon_opt_leaves=jax.tree_util.tree_leaves(recon_state),
            trans_opt_leaves=jax.tree_util.tree_leaves(trans_state),
            epoch=epx, loss=train_loss,
            best_quality=min(best_quality, quality) if save_every == 'best'
            else best_quality)
        if save_every == 'best':
            if quality < best_quality:
                best_quality = quality
                save_path = Path(base_dir) / config['mdl_save_prefix'] / \
                    f"{run_name}_best"
                save_checkpoint(save_path, ckpt_state)
                best_save_path = str(save_path)
                if stage is not None:
                    stage['save_path'] = str(save_path)
        elif isinstance(save_every, int) and (
                epx % save_every == 0 or epx + 1 == config['epochs']):
            save_path = Path(base_dir) / config['mdl_save_prefix'] / \
                f"{run_name}_epx{epx}"
            save_checkpoint(save_path, ckpt_state)
            best_save_path = str(save_path)
            if stage is not None:
                stage['save_path'] = str(save_path)

        if epx + 1 == stop_epoch and stop_epoch < config['epochs']:
            # pausing early: force-save the exact stop-epoch state (the periodic
            # cadence may not land here, and save_every='best' would roll a
            # resume back to the best epoch). Returned as the resume path; stage
            # chaining still points at the best/periodic save above.
            save_path = Path(base_dir) / config['mdl_save_prefix'] / \
                f"{run_name}_pause"
            save_checkpoint(save_path, ckpt_state)
            best_save_path = str(save_path)
            print(f"paused at epoch {epx}; resume with "
                  f"model_checkpoint_path={save_path}")

        if config.get('debug'):
            break

    logger.finish()
    return best_save_path


def _log_phase(logger, config, phase, loss, label_scores, global_idx):
    logger.log({f'losses/{phase}_loss': loss}, step=global_idx)
    (mean_pl, std_pl, mean_oa, std_oa) = reduce_label_scores(label_scores)
    logger.log_label_metrics(f'scores/{phase}_mean', mean_pl, global_idx)
    logger.log_label_metrics(f'scores/{phase}_std', std_pl, global_idx)
    logger.log_oa_metrics(f'scores/{phase}_mean_oa_exclude_bg', mean_oa, global_idx,
                          selected=('dice',))
    logger.log_oa_metrics(f'scores/{phase}_std_oa_exclude_bg', std_oa, global_idx)


def _load_segmenter(config, num_classes):
    """Frozen prescan/slice segmenter for from-segmented modes; None without a
    configured checkpoint (all from-gt configs)."""
    path = config.get('segment_model_path')
    if not path or config.get('label_slice_type') != 'from-segmented':
        return None, None
    from acquisition_focus_tpu.engine.checkpoint import (
        checkpoint_exists as _ck, load_checkpoint as _lc)
    if not _ck(path):
        print(f"warning: from-segmented configured but no checkpoint at {path}")
        return None, None
    from acquisition_focus_tpu.models.segmentation.unet2d import SegUnet2D
    state = _lc(path)
    return SegUnet2D(num_classes=num_classes), state['params']


def _eval_phase(phase, spec, unet, atms, unet_params, atm_params, dataset, idxs,
                config, logger, global_idx, epx, out_dir=None, seg=(None, None),
                put_batch=None):
    if dataset is None or len(dataset) == 0:
        return float('nan')
    if put_batch is None:
        put_batch = lambda b, train: _to_device(b)
    seg_model, seg_params = seg
    collect_artifacts = bool(config.get('do_output')) and phase in ('val', 'test')
    epx_affines = {}
    epx_inputs = {}
    scores = {}
    losses = []
    heavy = _heavy_metric_epoch(config, epx)
    batch_size = config.get('val_batch_size', 1)
    eval_tags = dataset.label_tags
    num_eval = len(eval_tags)

    for i, (sel, batch) in enumerate(dataset.iterate_eval_batches(idxs, batch_size)):
        rng = jax.random.fold_in(jax.random.key(config.get('seed', 0) + 7),
                                 global_idx * 10000 + i)
        with_aug = (phase in config.get('aug_phases', []) and
                    config.get('do_augment_input_orientation', False))
        out = eval_step(spec, unet, atms, unet_params, atm_params,
                        put_batch(batch, train=False), rng, with_aug=with_aug,
                        seg_model=seg_model, seg_params=seg_params)
        losses.append(float(out['loss']))
        accumulate_label_scores(scores, 'dice', np.asarray(out['dice']), eval_tags)

        if heavy:
            pred = np.asarray(out['pred'])
            target = np.asarray(batch['label'])
            if spec.use_binarized_labels:
                target = (target > 0).astype(np.int32)
            nifti_zooms = np.asarray(affine_zooms(batch['nii_affine']))
            zoom_norm = float(np.linalg.norm(nifti_zooms[0]))
            accumulate_label_scores(
                scores, 'iou',
                np.asarray(iou_per_class_labels(pred, target, num_eval)),
                eval_tags)
            if jax.default_backend() != 'cpu':
                # device exact-EDT surface distances: the host scipy path costs
                # ~80-160 s per metric epoch at 128^3 on the 1-core host
                hd_hd95 = np.asarray(
                    hausdorff_per_class_device(pred, target, num_eval))
                hd = hd_hd95[..., 0] * zoom_norm
                hd95 = hd_hd95[..., 1] * zoom_norm
            else:
                hd = hausdorff_per_class(pred, target, num_eval) * zoom_norm
                hd95 = hausdorff_per_class(
                    pred, target, num_eval, percentile=95) * zoom_norm
            accumulate_label_scores(scores, 'hd', hd, eval_tags)
            accumulate_label_scores(scores, 'hd95', hd95, eval_tags)

            vols_p = np.asarray(get_class_volumes(pred, nifti_zooms, num_eval, 'ml'))
            vols_t = np.asarray(get_class_volumes(target, nifti_zooms, num_eval, 'ml'))
            diff = np.abs(vols_p - vols_t)
            accumulate_label_scores(scores, 'delta_vol_ml', diff, eval_tags)
            accumulate_label_scores(scores, 'delta_vol_rel',
                                    diff / np.maximum(vols_t, 1e-8), eval_tags)

        if collect_artifacts:
            for j, case_id in enumerate(sel):
                epx_affines[case_id] = {
                    'grid_affines': np.asarray(out['grid_affines'][:, j]),
                    'transformed_nii_affines': np.asarray(
                        out['out_nii_affines'][:, j]),
                    'thetas': np.asarray(out['thetas'][:, j]),
                }
                epx_inputs[case_id] = np.asarray(out['b_input'][j], np.float16)

        if out_dir:
            _store_eval_output(out_dir, i, sel, batch, out)
        if config.get('debug'):
            break

    if collect_artifacts and epx_affines:
        _store_epoch_artifacts(logger.dir, phase, epx, epx_affines, epx_inputs,
                               len(config['base_views']))

    loss = float(np.mean(losses)) if losses else float('nan')
    _log_phase(logger, config, phase, loss, scores, global_idx)
    return loss


def _store_epoch_artifacts(run_dir, phase, epx, epx_affines, epx_inputs, n_views):
    """Per-epoch learned-geometry + slice-input artifacts
    (reference run_dl.py:569-595: dill affine dumps, PNG mosaics, compact inputs)."""
    import pickle
    from pathlib import Path as _P
    out_dir = _P(run_dir) / 'output' / phase
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / f'affines_{phase}_epx_{epx:05d}.pkl', 'wb') as f:
        pickle.dump(epx_affines, f)
    try:
        from acquisition_focus_tpu.utils.visualize import (
            save_frameless_image, slice_input_mosaic)
        inputs = np.stack(list(epx_inputs.values())).astype(np.float32)
        mosaic = slice_input_mosaic(inputs, n_views)
        save_frameless_image(mosaic, out_dir / f'slices_{phase}_epx_{epx:05d}.png',
                             cmap='RdPu')
    except Exception as e:  # plotting must never kill training
        print(f'artifact image failed: {e}')
    np.savez_compressed(out_dir / f'input_{phase}_epx_{epx:05d}.npz',
                        **{k: v for k, v in epx_inputs.items()})


def _store_eval_output(out_dir, batch_idx, sel, batch, out):
    """Dump network inputs/outputs for test-only runs (reference run_dl.py:534-537)."""
    import pickle
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    payload = dict(
        ids=sel,
        input=np.asarray(out['b_input'], np.float16),
        pred=np.asarray(out['pred'], np.int8),
        target=np.asarray(batch['label'], np.int8),
        thetas=np.asarray(out['thetas']),
        grid_affines=np.asarray(out['grid_affines']),
        out_nii_affines=np.asarray(out['out_nii_affines']),
    )
    with open(out_dir / f'output_batch{batch_idx:05d}.pkl', 'wb') as f:
        pickle.dump(payload, f)
