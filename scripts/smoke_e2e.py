"""End-to-end smoke: phantom dataset on disk -> main.py stage sweep (tiny config)."""
import json
import sys
import tempfile
from pathlib import Path

from acquisition_focus_tpu.data.synthetic import write_phantom_dataset


def main(out_root=None, epochs=2, spat=32, n_cases=6, views=("p2CH", "p4CH"),
         debug=True):
    root = Path(out_root or tempfile.mkdtemp(prefix="af_smoke_"))
    data_dir = root / "phantom_data"
    if not (data_dir / "metadata/data_split.json").exists():
        write_phantom_dataset(data_dir, n_cases=n_cases, shape=(64, 64, 64))

    fov = float(spat) * 1.5
    cfg = dict(
        dataset=["synthetic", str(data_dir)],
        epochs=epochs, batch_size=1, num_grad_accum_steps=2, val_batch_size=1,
        base_views=list(views),
        hires_fov_mm=[fov] * 3, hires_fov_vox=[spat] * 3,
        slice_fov_mm=[fov, fov, 1.5], slice_fov_vox=[spat, spat, 1],
        prescan_fov_mm=[fov] * 3, prescan_fov_vox=[spat] * 3,
        num_folds=3, fold_override=0, debug=debug,
        compute_dtype="float32", num_sa_slices=3,
        log_dir=str(root / "runs"), mdl_save_prefix=str(root / "models"),
        metrics_every=1000,
        use_caching=True,
    )
    cfg_path = root / "config.json"
    cfg_path.write_text(json.dumps(cfg))

    sys.argv = ["main.py", "--config_path", str(cfg_path),
                "--base_dir", str(root)]
    import main as cli
    cli.main(["--config_path", str(cfg_path), "--base_dir", str(root)])
    print("SMOKE OK; artifacts under", root)
    return root


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--out_root", default=None)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--debug", action="store_true", default=True)
    a = p.parse_args()
    main(a.out_root, a.epochs)
