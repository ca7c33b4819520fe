"""utils.results: metrics.jsonl aggregation into the reference's ablation-table
shapes (per-run per-class dice, and the cross-fold mean/std groupby of
visualize/get_run_data.ipynb cells 11-13)."""

import json

import numpy as np

from acquisition_focus_tpu.utils.results import cross_fold_table, dice_table

TAGS = ('MYO', 'LV', 'RV', 'LA', 'RA')


def _write_run(log_dir, name, dice_by_tag, oa, steps=(10, 20)):
    run = log_dir / name
    run.mkdir(parents=True)
    with open(run / 'metrics.jsonl', 'w') as f:
        for s in steps:
            rec = {'step': s, 'losses/train_loss': 1.0 / s}
            # only the LAST step's scores should appear in the tables
            scale = 1.0 if s == steps[-1] else 0.01
            for t, v in dice_by_tag.items():
                rec[f'scores/test_mean_dice_{t}'] = v * scale
            rec['scores/test_mean_oa_exclude_bg_dice'] = oa * scale
            f.write(json.dumps(rec) + '\n')


def test_dice_table_last_step_wide(tmp_path):
    _write_run(tmp_path, 'run_fold-0_stage-ref',
               {t: 0.5 for t in TAGS}, oa=0.5)
    table = dice_table(tmp_path)
    assert list(table.columns) == list(TAGS) + ['overall']
    assert np.allclose(table.loc['run_fold-0_stage-ref'], 0.5)


def test_cross_fold_table_groups_stages_across_folds(tmp_path):
    # two stages x three folds with known per-fold values
    for fold in range(3):
        _write_run(tmp_path, f'run_fold-{fold}_stage-opt_view0',
                   {t: 0.4 + 0.1 * fold for t in TAGS}, oa=0.4 + 0.1 * fold)
        _write_run(tmp_path, f'run_fold-{fold}_stage-ref',
                   {t: 0.7 for t in TAGS}, oa=0.7)
    mean, std = cross_fold_table(tmp_path)
    assert set(mean.index) == {'opt_view0', 'ref'}
    assert np.allclose(mean.loc['opt_view0'], 0.5)      # mean(0.4, 0.5, 0.6)
    assert np.allclose(std.loc['opt_view0', 'MYO'], np.std([0.4, 0.5, 0.6]))
    assert np.allclose(mean.loc['ref'], 0.7)
    assert np.allclose(std.loc['ref'], 0.0)


def test_cross_fold_table_unsuffixed_runs_fall_back_to_main(tmp_path):
    _write_run(tmp_path, 'plain_fold-0', {t: 0.3 for t in TAGS}, oa=0.3)
    mean, _ = cross_fold_table(tmp_path)
    assert list(mean.index) == ['main']
