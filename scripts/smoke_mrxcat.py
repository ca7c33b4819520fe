"""MRXCAT-family end-to-end smoke: phantom data in MRXCAT file layout driven
through the MRXCATDataset class and the full CLI stage sweep.

The MMWHS-layout phantom smoke (scripts/smoke_e2e.py / train_phantom_e2e.py)
exercises everything downstream of the dataset; this run proves the MRXCAT id
regex / 3d-id grouping / fold construction work against real files on disk, not
just the unit-tested strings (reference mrxcat_dataset.py:11-48).
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run(epochs=2, spat=32, out_root=None, cpu=False):
    if cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from acquisition_focus_tpu.data.synthetic import write_phantom_dataset

    out_root = Path(out_root or REPO / ".cache/mrxcat_smoke")
    data_dir = out_root / "data"
    if not (data_dir / "metadata/data_split.json").exists():
        print("writing MRXCAT-layout phantom dataset ...", flush=True)
        write_phantom_dataset(
            data_dir, n_cases=6, shape=(32, 32, 32),
            file_pattern="phantom_{idx:03d}_t000_{kind}.nii.gz")

    # 32-cube phantom data at 1.5 mm: the scaled heart (~37 mm) fits a 48 mm FOV
    fov = float(spat) * 1.5
    cfg = dict(
        dataset=["mrxcat", str(data_dir)],
        epochs=epochs, batch_size=1, num_grad_accum_steps=2, val_batch_size=1,
        base_views=["p2CH", "p4CH"],
        hires_fov_mm=[fov] * 3, hires_fov_vox=[spat] * 3,
        slice_fov_mm=[fov, fov, 1.5], slice_fov_vox=[spat, spat, 1],
        prescan_fov_mm=[fov] * 3, prescan_fov_vox=[spat] * 3,
        num_folds=3, fold_override=0,
        compute_dtype="float32", num_sa_slices=3,
        base_features=[8, 16, 32, 64, 128, 128], locnet_width=16,
        log_dir=str(out_root / "runs"), mdl_save_prefix=str(out_root / "models"),
        metrics_every=1000, save_every="best", do_output=False,
        use_caching=False,
    )
    cfg_path = out_root / "config.json"
    out_root.mkdir(parents=True, exist_ok=True)
    cfg_path.write_text(json.dumps(cfg))

    t0 = time.time()
    import main as cli
    cli.main(["--config_path", str(cfg_path), "--base_dir", str(out_root)])
    print(f"MRXCAT SMOKE OK in {(time.time() - t0) / 60:.1f} min; "
          f"runs under {out_root}", flush=True)


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--cpu", action="store_true")
    a = p.parse_args()
    run(epochs=a.epochs, cpu=a.cpu)
