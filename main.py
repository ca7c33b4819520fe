"""CLI orchestrator: config merge, fold construction, dataset build/caching, and the
per-fold stage sweep.

Capability port of /root/reference/main_acquisition_focus.py:103-191 with the same
config keys and run flow (``--meta_config_path`` JSON overrides the base config;
``sweep_type`` 'stage-sweep' runs opt_view{i}->ref per fold).
"""

import argparse
import json
from datetime import datetime
from pathlib import Path

from acquisition_focus_tpu.data.cache import load_or_build
from acquisition_focus_tpu.data.mrxcat import get_dataset_class
from acquisition_focus_tpu.engine.config import DotDict, load_config
from acquisition_focus_tpu.engine.runner import run_dl
from acquisition_focus_tpu.engine.stages import get_std_stages, merge_stage_config
from acquisition_focus_tpu.utils.logging import get_fold_postfix


def build_fold_iter(config, training_dataset):
    """Fold index lists from data_split.json (reference main:143-170)."""
    if config['num_folds'] < 1:
        return [(-1, (list(range(len(training_dataset))), []))]

    fold_iter = []
    split = training_dataset.data_split
    for fold_idx in range(config['num_folds']):
        fold = split['train_folds'][f'fold_{fold_idx}']
        train_files = [split['train_files'][i] for i in fold['train_idxs']]
        val_files = [split['train_files'][i] for i in fold['val_idxs']]
        train_ids = {training_dataset.extract_3d_id(
            training_dataset.get_file_id(f)[0]) for f in train_files}
        val_ids = {training_dataset.extract_3d_id(
            training_dataset.get_file_id(f)[0]) for f in val_files}
        overlap = train_ids & val_ids
        assert not overlap, f"Train and val sets overlap: {overlap}"
        train_idxs = [i for i in training_dataset.switch_3d_identifiers(
            sorted(train_ids)) if i is not None]
        val_idxs = [i for i in training_dataset.switch_3d_identifiers(
            sorted(val_ids)) if i is not None]
        fold_iter.append((fold_idx, (train_idxs, val_idxs)))

    if config.get('fold_override') is not None:
        k = config['fold_override']
        fold_iter = fold_iter[k:k + 1]
    return fold_iter


def _load_sweep_state(path):
    p = Path(path)
    if p.exists():
        return json.loads(p.read_text())
    return {'completed': {}, 'in_progress': None}


def _save_sweep_state(path, state):
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(json.dumps(state, indent=2))


def stage_sweep_run(base_dir, run_name, config, fold_properties, stages,
                    training_dataset, test_dataset, run_test_once_only):
    """Per-fold stage sweep (reference main_acquisition_focus.py:77-99).

    With ``sweep_state_path`` set, the sweep is crash-resumable at stage
    granularity: completed stages are recorded (with their best ``save_path``
    so checkpoint chaining survives a relaunch) and skipped on re-run; a stage
    that was interrupted mid-training is resumed from its own best checkpoint
    via the runner's full-state restore instead of restarting at epoch 0.
    """
    state_path = config.get('sweep_state_path')
    fold_key = f"fold-{fold_properties[0]}"
    state = _load_sweep_state(state_path) if state_path else None

    for stage in stages:
        stage_id = stages.current_key
        stage_key = f"{fold_key}/{stage_id}"

        if state is not None and stage_key in state['completed']:
            # stage already ran to completion in a previous launch: hand its
            # recorded best save forward so chaining into the next stage works
            rec = state['completed'][stage_key]
            if rec.get('save_path'):
                stage['save_path'] = rec['save_path']
            stage.activate()
            print(f"Skipping completed stage {stage_key} "
                  f"(save_path={rec.get('save_path')})")
            continue

        stage.activate()
        stage_config = merge_stage_config(DotDict(config.copy()), stage)
        stage_run_name = f"{run_name}_stage-{stage_id}"

        if state is not None:
            prog = state.get('in_progress')
            if prog and prog.get('stage_key') == stage_key:
                # interrupted mid-stage: resume from that launch's best save
                prev_best = Path(base_dir) / config['mdl_save_prefix'] / \
                    f"{prog['run_name']}_best"
                from acquisition_focus_tpu.engine.checkpoint import \
                    checkpoint_exists
                if checkpoint_exists(str(prev_best)):
                    stage_config['model_checkpoint_path'] = str(prev_best)
                    stage_run_name = prog['run_name']  # keep one metric stream
                    print(f"Resuming interrupted stage {stage_key} "
                          f"from {prev_best}")
            state['in_progress'] = {'stage_key': stage_key,
                                    'run_name': stage_run_name}
            _save_sweep_state(state_path, state)

        print(f"Running {stage_run_name}")
        run_dl(base_dir, stage_config, fold_properties, stage=stage,
               training_dataset=training_dataset, test_dataset=test_dataset,
               run_test_once_only=run_test_once_only, run_name=stage_run_name)

        if state is not None:
            state['completed'][stage_key] = {
                'save_path': stage.get('save_path'),
                'run_name': stage_run_name}
            state['in_progress'] = None
            _save_sweep_state(state_path, state)


def _enable_compile_cache():
    """Persistent XLA compile cache: stage sweeps re-enter identical shapes, and
    on this host a full train_step compile is minutes (CPU) / tens of seconds
    (TPU remote compile) — cache hits make re-runs and resumed sweeps start in
    seconds. Opt out with AF_NO_COMPILE_CACHE=1."""
    import os
    if os.environ.get('AF_NO_COMPILE_CACHE'):
        return
    import jax
    cache_dir = os.environ.get(
        'AF_COMPILE_CACHE_DIR',
        str(Path(__file__).resolve().parent / '.cache' / 'jax'))
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    except Exception as e:  # never let the cache sink a run
        print(f'warning: no persistent compile cache ({e})')


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--meta_config_path', type=str, default=None)
    parser.add_argument('--config_path', type=str, default=None,
                        help='base config json (defaults to built-in DEFAULTS)')
    parser.add_argument('--base_dir', type=str, default='.')
    args = parser.parse_args(argv)

    _enable_compile_cache()
    config = load_config(args.config_path, args.meta_config_path)
    if config.get('debug_nans'):
        # nan/inf detection in every jitted computation — the TPU-native analog of
        # the reference's dormant anomaly hooks (torch_utils.py:124-149, run_dl.py:32)
        import jax
        jax.config.update('jax_debug_nans', True)
    run_test_once_only = bool(config.get('test_only_and_output_to'))

    dataset_name, dataset_dir = config['dataset']
    dataset_cls = get_dataset_class(dataset_name)

    training_dataset = load_or_build(
        dataset_cls, dataset_dir, config,
        state='empty' if run_test_once_only else 'train',
        debug=config.get('debug', False))
    test_dataset = load_or_build(
        dataset_cls, dataset_dir, config, state='test',
        debug=config.get('debug', False))

    fold_iter = build_fold_iter(config, training_dataset) \
        if not run_test_once_only else [(0, ([], []))]

    now = datetime.now().strftime('%Y%m%d__%H_%M_%S')
    # tag with the platform actually executing, not config['device'] wishful
    # thinking (a --cpu fallback run used to be named "_tpu")
    import jax
    run_name = f"{now}_{jax.default_backend()}"

    for fold_properties in fold_iter:
        fold_run_name = f"{run_name}_{get_fold_postfix(fold_properties)}"
        if config.get('sweep_type') is None:
            run_dl(args.base_dir, config, fold_properties,
                   training_dataset=training_dataset, test_dataset=test_dataset,
                   run_test_once_only=run_test_once_only, run_name=fold_run_name)
        elif config['sweep_type'] == 'stage-sweep':
            stages = get_std_stages(config)
            stage_sweep_run(args.base_dir, fold_run_name, config, fold_properties,
                            stages, training_dataset, test_dataset,
                            run_test_once_only)
        else:
            raise ValueError(config['sweep_type'])

        if config.get('debug') or run_test_once_only:
            break


if __name__ == '__main__':
    main()
