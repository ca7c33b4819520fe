"""Short REAL executions of representative meta-configs on the phantom.

The shipped meta-config grid (an id-for-id port of the reference's
``meta_configs/meta_configs_{MMWHS,MRXCAT}/config_dict_id*.json``) is
trace-gated in CI (tests/test_meta_configs.py: every unique StageSpec
signature shape-traces train_step + eval_step). This script adds *execution*
evidence for the exotic config paths: it runs a handful of representative ids
for a few real epochs each on the synthetic phantom (this image has no MMWHS/
MRXCAT data — REAL-DATA.md), proving the 32^3-prescan, binarized-label,
from-segmented and stage_override variants run, not just compile.

Each run goes through the production ``main.py`` with only these overrides:
dataset -> the phantom dir, epochs -> a small count, fold 0, run-root paths,
and (for from-segmented ids) the segmenter checkpoint. Everything else is the
meta-config's own semantics (reference grid: /root/reference/meta_configs/).

Usage:
  python scripts/run_meta_short.py --ids 0 11 20 --epochs 3 \
      [--segment_model_path <ckpt>] [--out_dir artifacts/meta_short]
"""

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from acquisition_focus_tpu.data.synthetic import write_phantom_dataset  # noqa: E402


def run_one(meta_id, epochs, data_dir, out_root, segment_model_path=None,
            family='meta_configs_MMWHS'):
    meta_path = REPO / 'meta_configs' / family / f'config_dict_id{meta_id}.json'
    meta = json.loads(meta_path.read_text())
    run_root = out_root / f'id{meta_id}'
    run_root.mkdir(parents=True, exist_ok=True)

    # base config: phantom data + short budget; the meta-config overlays its
    # own keys on top via main.py's standard merge
    base = dict(
        dataset=['synthetic', str(data_dir)],
        epochs=epochs, batch_size=2, num_grad_accum_steps=2, val_batch_size=1,
        hires_fov_mm=[192.0] * 3, hires_fov_vox=[128] * 3,
        slice_fov_mm=[192.0, 192.0, 1.5], slice_fov_vox=[128, 128, 1],
        prescan_fov_mm=[192.0] * 3, prescan_fov_vox=[128] * 3,
        num_folds=3, fold_override=0, compute_dtype='bfloat16',
        num_sa_slices=15, metrics_every=max(1, epochs - 1), save_every='best',
        do_output=False, use_caching=True,
        log_dir=str(run_root / 'runs'),
        mdl_save_prefix=str(run_root / 'models'),
    )
    if segment_model_path:
        base['segment_model_path'] = str(segment_model_path)
    base_path = run_root / 'base_config.json'
    base_path.write_text(json.dumps(base))

    # the meta json's dataset points at MMWHS; retarget it at the phantom
    meta = dict(meta)
    meta['dataset'] = base['dataset']
    meta_run_path = run_root / 'meta_config.json'
    meta_run_path.write_text(json.dumps(meta))

    print(f'=== meta id{meta_id}: {sorted(set(meta) - {"meta_config_id", "dataset"})} ===',
          flush=True)
    import main as cli
    cli.main(['--config_path', str(base_path),
              '--meta_config_path', str(meta_run_path),
              '--base_dir', str(run_root)])

    # summarize: last train/val loss per produced metric stream
    summary = {}
    for mf in sorted((run_root / 'runs').glob('*/metrics.jsonl')):
        losses = [json.loads(l) for l in mf.read_text().splitlines()]
        tl = [r['losses/train_loss'] for r in losses if 'losses/train_loss' in r]
        summary[mf.parent.name] = {
            'train_loss_first': tl[0] if tl else None,
            'train_loss_last': tl[-1] if tl else None,
            'n_epochs': len(tl),
        }
    (run_root / 'summary.json').write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary, indent=2), flush=True)
    return summary


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--ids', type=int, nargs='+', required=True)
    p.add_argument('--epochs', type=int, default=3)
    p.add_argument('--family', default='meta_configs_MMWHS')
    p.add_argument('--data_dir', default=str(REPO / '.cache/e2e_phantom_data'))
    p.add_argument('--out_dir', default=str(REPO / 'artifacts/meta_short'))
    p.add_argument('--segment_model_path', default=None)
    a = p.parse_args()

    data_dir = Path(a.data_dir)
    if not (data_dir / 'metadata/data_split.json').exists():
        print('writing phantom dataset ...', flush=True)
        write_phantom_dataset(data_dir, n_cases=14, shape=(96, 96, 96))

    out_root = Path(a.out_dir)
    results = {}
    for mid in a.ids:
        results[mid] = run_one(mid, a.epochs, data_dir, out_root,
                               a.segment_model_path, a.family)
    (out_root / 'all_summaries.json').write_text(json.dumps(results, indent=2))
