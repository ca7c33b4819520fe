"""Longer phantom training: demonstrates learning dynamics (loss down, dice up)
through the full stage sweep on synthetic hearts. Round-1 evidence run; also a
handy regression workload (`--spat 64 --epochs 10` ~ 1h on one v5e chip incl.
compiles).
"""
import argparse
import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from acquisition_focus_tpu.data.synthetic import write_phantom_dataset  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--out_root', default=None)
    p.add_argument('--epochs', type=int, default=10)
    p.add_argument('--spat', type=int, default=64)
    p.add_argument('--n_cases', type=int, default=10)
    p.add_argument('--views', nargs='*', default=['p2CH', 'p4CH'])
    args = p.parse_args()

    root = Path(args.out_root or tempfile.mkdtemp(prefix='af_train_'))
    data_dir = root / 'phantom_data'
    if not (data_dir / 'metadata/data_split.json').exists():
        write_phantom_dataset(data_dir, n_cases=args.n_cases, shape=(96, 96, 96))

    fov = float(args.spat) * 1.5
    cfg = dict(
        dataset=['synthetic', str(data_dir)],
        epochs=args.epochs, batch_size=2, num_grad_accum_steps=2, val_batch_size=1,
        base_views=list(args.views),
        hires_fov_mm=[fov] * 3, hires_fov_vox=[args.spat] * 3,
        slice_fov_mm=[fov, fov, 1.5], slice_fov_vox=[args.spat, args.spat, 1],
        prescan_fov_mm=[fov] * 3, prescan_fov_vox=[args.spat] * 3,
        num_folds=3, fold_override=0, debug=False,
        compute_dtype='bfloat16', num_sa_slices=3,
        log_dir=str(root / 'runs'), mdl_save_prefix=str(root / 'models'),
        metrics_every=max(2, args.epochs - 1),
        use_caching=True, do_output=True,
    )
    cfg_path = root / 'config.json'
    cfg_path.write_text(json.dumps(cfg))

    import main as cli
    cli.main(['--config_path', str(cfg_path), '--base_dir', str(root)])

    # summarize
    from acquisition_focus_tpu.utils.results import summarize_runs
    table = summarize_runs(root / 'runs', 'scores/test_mean_oa_exclude_bg_dice')
    print(table.to_string() if not table.empty else 'no metrics found')
    print('artifacts under', root)


if __name__ == '__main__':
    main()
