"""Epoch-level benchmark: wall-clock of one REAL training epoch — host batching,
jitted train steps, eval cadence, logging — on the synthetic phantom at production
scale (the BASELINE.json north-star metric next to bench.py's pure step timing).

Two modes:
  python bench_epoch.py --from_run <runs dir or run root>
      Reads perf/epoch_s records that engine.runner logs into each run's
      metrics.jsonl (e.g. the artifacts of scripts/train_phantom_e2e.py) and
      reports steady-state epoch wall-clock without re-running anything.
  python bench_epoch.py
      Runs its own 3-epoch phantom training (128^3 @ 192mm, 3 views, batch 2 x
      accum 2) on the available chip, then reports epoch 1+ (epoch 0 pays the
      XLA compile).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": "s/epoch", ...}.
"""

import argparse
import json
from pathlib import Path

REPO = Path(__file__).resolve().parent


def collect_epoch_records(root):
    """All (epoch_s, train_slices) records from metrics.jsonl files under root,
    per run, in write order."""
    root = Path(root)
    files = sorted(root.glob('**/metrics.jsonl'))
    runs = {}
    for f in files:
        recs = []
        with open(f) as fh:
            for line in fh:
                rec = json.loads(line)
                if 'perf/epoch_s' in rec:
                    recs.append((rec['perf/epoch_s'],
                                 rec.get('perf/train_slices', 0)))
        if recs:
            runs[str(f.parent.name)] = recs
    return runs


def report(runs, source='recorded run'):
    import numpy as np
    # drop each run's first epoch: it pays the jit compile of train/eval steps
    steady = [r for recs in runs.values() for r in recs[1:]]
    if not steady:  # single-epoch runs only: report what exists
        steady = [r for recs in runs.values() for r in recs]
    times = np.asarray([t for t, _ in steady], np.float64)
    slices = np.asarray([s for _, s in steady], np.float64)
    with_slices = slices > 0
    sps = float((slices[with_slices] / times[with_slices]).mean()) \
        if with_slices.any() else None
    out = {
        'metric': 'phantom epoch wall-clock (train + val + test eval; '
                  f'{source})',
        'value': round(float(np.median(times)), 2),
        'unit': 's/epoch',
        'vs_baseline': 1.0,
        'epoch_s_min': round(float(times.min()), 2),
        'epochs_measured': int(times.size),
        'train_slices_per_sec_incl_host': round(sps, 3) if sps else None,
    }
    print(json.dumps(out))
    return out


def run_fresh(epochs=3, spat=128, n_cases=12):
    import sys
    import main as cli
    from acquisition_focus_tpu.data.synthetic import write_phantom_dataset

    root = REPO / '.cache/bench_epoch'
    data_dir = root / 'data'
    if not (data_dir / 'metadata/data_split.json').exists():
        write_phantom_dataset(data_dir, n_cases=n_cases, shape=(96, 96, 96))
    fov = spat * 1.5
    cfg = dict(
        dataset=['synthetic', str(data_dir)],
        epochs=epochs, batch_size=2, num_grad_accum_steps=2, val_batch_size=1,
        base_views=['p2CH', 'p4CH', 'SA-7'],
        hires_fov_mm=[fov] * 3, hires_fov_vox=[spat] * 3,
        slice_fov_mm=[fov, fov, 1.5], slice_fov_vox=[spat, spat, 1],
        prescan_fov_mm=[fov] * 3, prescan_fov_vox=[spat] * 3,
        num_folds=3, fold_override=0, sweep_type=None, use_affine_theta=True,
        compute_dtype='bfloat16', num_sa_slices=15,
        log_dir=str(root / 'runs'), mdl_save_prefix=str(root / 'models'),
        metrics_every=1000, save_every=None, use_caching=True,
    )
    cfg_path = root / 'config.json'
    root.mkdir(parents=True, exist_ok=True)
    cfg_path.write_text(json.dumps(cfg))
    cli.main(['--config_path', str(cfg_path), '--base_dir', str(root)])
    return root / 'runs'


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--from_run', default=None,
                   help='report from existing metrics.jsonl files under this dir')
    p.add_argument('--epochs', type=int, default=3)
    args = p.parse_args()
    if args.from_run:
        runs_dir, source = args.from_run, f'recorded run {args.from_run}'
    else:
        runs_dir = run_fresh(epochs=args.epochs)
        source = '128^3@192mm production scale, 3 views'
    runs = collect_epoch_records(runs_dir)
    if not runs:
        raise SystemExit(f'no perf/epoch_s records under {runs_dir}')
    report(runs, source)


if __name__ == '__main__':
    main()
