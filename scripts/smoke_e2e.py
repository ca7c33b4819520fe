"""End-to-end smoke: phantom dataset on disk -> main.py stage sweep (tiny config)."""
import json
import sys
import tempfile
from pathlib import Path

from acquisition_focus_tpu.data.synthetic import write_phantom_dataset


def main(out_root=None, epochs=2, spat=32, n_cases=6, views=("p2CH", "p4CH"),
         debug=True, segment_model_path=None):
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
    if segment_model_path:
        # from-segmented: view planning affines come from the frozen segmenter's
        # prescan segmentation, not the GT label (reference run_dl.py:243-248);
        # no output transpose — the checkpoint is in-framework.
        cfg.update(clinical_view_affine_type="from-segmented",
                   segment_model_path=str(segment_model_path),
                   segment_extra_permute=False)
    cfg_path = root / "config.json"
    cfg_path.write_text(json.dumps(cfg))

    if segment_model_path:
        compare_affine_sources(data_dir, cfg)

    sys.argv = ["main.py", "--config_path", str(cfg_path),
                "--base_dir", str(root)]
    import main as cli
    cli.main(["--config_path", str(cfg_path), "--base_dir", str(root)])
    print("SMOKE OK; artifacts under", root)
    return root


def compare_affine_sources(data_dir, cfg):
    """Evidence that from-segmented actually changes the training inputs: build
    the dataset both ways and report the per-view rotation/translation gap
    between segmented-prescan and GT input affines."""
    import numpy as np
    from acquisition_focus_tpu.data.cache import load_or_build
    from acquisition_focus_tpu.data.mrxcat import get_dataset_class
    from acquisition_focus_tpu.engine.config import load_config

    cls = get_dataset_class(cfg["dataset"][0])
    cfg_seg = load_config(overrides=dict(cfg))
    cfg_gt = load_config(overrides={**cfg, "clinical_view_affine_type": "from-gt",
                                    "segment_model_path": None})
    ds_seg = load_or_build(cls, data_dir, cfg_seg, state="train")
    ds_gt = load_or_build(cls, data_dir, cfg_gt, state="train")
    print("input-affine gap (segmented prescan vs GT):")
    for cid in sorted(ds_seg.cases):
        a, b = (np.asarray(d.cases[cid]["input_view_affines"], np.float64)
                for d in (ds_seg, ds_gt))
        for v, name in enumerate(cfg["base_views"]):
            ra, rb = a[v, :3, :3], b[v, :3, :3]
            ra, rb = (r / np.linalg.norm(r, axis=0, keepdims=True)
                      for r in (ra, rb))
            cos = (np.trace(rb.T @ ra) - 1) / 2
            ang = float(np.degrees(np.arccos(np.clip(cos, -1, 1))))
            dt = float(np.linalg.norm(a[v, :3, 3] - b[v, :3, 3]))
            q = ds_seg.cases[cid].get("prescan_quality", {})
            print(f"  {cid} {name}: rot {ang:6.2f} deg, trans {dt:.4f} "
                  f"(prescan dice {q.get('dice_mean', float('nan')):.3f})")


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--out_root", default=None)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--debug", action="store_true", default=True)
    p.add_argument("--segment_model_path", default=None,
                   help="run from-segmented with this orbax segmenter checkpoint")
    a = p.parse_args()
    main(a.out_root, a.epochs, segment_model_path=a.segment_model_path)
