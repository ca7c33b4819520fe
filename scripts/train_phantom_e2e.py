"""Full end-to-end phantom training on the real TPU chip.

Runs the complete 3-view stage sweep (opt_view0..2 + ref) at production scale
(128^3 @ 192 mm, bf16 compute, batch 2 x accum 2) on the synthetic heart phantom,
then collects the round's training-result artifacts under ``artifacts/e2e_phantom``:

- ``metrics_stage-*.jsonl``  — the per-stage metric streams (loss + Dice curves),
- ``training_curves.png``    — loss / val-Dice curves across the sweep,
- ``summary.json``           — final per-class test Dice + epoch wall-clocks,
- ``affines_final.pkl``      — the learned per-view grid affines of the last epoch
  (input to utils/visualize.plot_learned_planes).

This is the evidence artifact for the "convergent end-to-end run" axis: it
exercises stages, checkpoint chaining, eval cadence, artifact dumps, and the
Dice metric pipeline on real hardware (reference training recipe:
/root/reference/config_dict.json:2-8, stage machinery running/stages.py:58-89).
"""

import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from acquisition_focus_tpu.data.synthetic import write_phantom_dataset  # noqa: E402


def run(epochs=40, n_cases=14, views=("p2CH", "p4CH", "SA-7"), spat=128,
        data_dir=None, out_dir=None, compute_dtype="bfloat16", fov_mult=1.5,
        base_features=None, locnet_width=None, model_type=None,
        single_stage=False, all_folds=False, binarized=False,
        batch_size=2, accum=2, metrics_every=5, prescan=None,
        theta_refresh=1, seed=0):
    """fov_mult: mm per output voxel. 1.5 at spat=128 is the reference geometry
    (192 mm FOV); a reduced-resolution run (e.g. the spat=32 CPU fallback when
    the TPU backend is down) needs a larger multiplier so the ~110 mm phantom
    heart still fits inside the FOV (32 * 4.5 = 144 mm).

    base_features/locnet_width: None keeps the reference widths; the CPU
    fallback passes reduced widths (a reference-width epoch is ~12 min on the
    1-core host — ~20 h for a full sweep)."""
    data_dir = Path(data_dir or REPO / ".cache/e2e_phantom_data")
    out_dir = Path(out_dir or REPO / "artifacts/e2e_phantom")
    run_root = REPO / ".cache" / f"{out_dir.name}_run"
    run_root.mkdir(parents=True, exist_ok=True)

    if not (data_dir / "metadata/data_split.json").exists():
        print("writing phantom dataset ...", flush=True)
        write_phantom_dataset(data_dir, n_cases=n_cases, shape=(96, 96, 96))

    fov = float(spat) * float(fov_mult)
    cfg = dict(
        dataset=["synthetic", str(data_dir)],
        epochs=epochs, batch_size=batch_size, num_grad_accum_steps=accum,
        val_batch_size=1,
        base_views=list(views),
        hires_fov_mm=[fov] * 3, hires_fov_vox=[spat] * 3,
        slice_fov_mm=[fov, fov, 1.5], slice_fov_vox=[spat, spat, 1],
        prescan_fov_mm=[fov] * 3, prescan_fov_vox=[spat] * 3,
        num_folds=3, fold_override=0,
        compute_dtype=compute_dtype, num_sa_slices=15,
        log_dir=str(run_root / "runs"), mdl_save_prefix=str(run_root / "models"),
        metrics_every=metrics_every, save_every="best", do_output=True,
        use_caching=True,
        # crash-resumable sweep: completed stages are skipped on relaunch,
        # an interrupted stage resumes from its best checkpoint (main.py)
        sweep_state_path=str(run_root / "sweep_state.json"),
    )
    if prescan is not None:
        # locnet-input-resolution ablation (round-5 perf lever): same physical
        # FOV, coarser prescan grid for the localization nets only
        cfg["prescan_fov_vox"] = [int(prescan)] * 3
    if theta_refresh and int(theta_refresh) > 1:
        cfg["theta_refresh_every"] = int(theta_refresh)
    cfg["seed"] = int(seed)
    if base_features is not None:
        cfg["base_features"] = list(base_features)
    if locnet_width is not None:
        cfg["locnet_width"] = int(locnet_width)
    if model_type is not None:
        cfg["model_type"] = model_type
        if model_type != 'hybrid-unet':
            # the (E)Pix2Vox baselines emit bg/fg occupancy; the reference runs
            # them only with binarized labels (meta_configs id20-28)
            binarized = True
    if binarized:
        cfg["use_binarized_labels"] = True
    if all_folds:
        # full 3-fold cross-validation (reference main_acquisition_focus.py:143-176):
        # main.py iterates every fold, metric streams are fold-postfixed
        cfg["fold_override"] = None
    if single_stage:
        # one plain fixed-view training run (no stage sweep): the related-works
        # comparison protocol — train the reconstruction model at the clinical
        # init views for the full budget (reference run_dl.py:361-364 dispatch)
        cfg["sweep_type"] = None
        cfg["view_optimization_mode"] = "opt-none"
        cfg["use_affine_theta"] = False
    cfg_path = run_root / "config.json"
    cfg_path.write_text(json.dumps(cfg))

    t0 = time.time()
    import main as cli
    cli.main(["--config_path", str(cfg_path), "--base_dir", str(run_root)])
    wall = time.time() - t0
    print(f"sweep done in {wall / 60:.1f} min", flush=True)

    collect_artifacts(run_root, out_dir, wall)


def _read_jsonl(path):
    with open(path) as f:
        return [json.loads(line) for line in f]


def collect_artifacts(run_root, out_dir, wall_s=None):
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    run_dirs = sorted((Path(run_root) / "runs").glob("*_stage-*"))
    if not run_dirs:  # single-stage (no sweep) run: one unsuffixed run dir
        run_dirs = sorted((Path(run_root) / "runs").glob("*_fold-*"))
    stages = {}
    multifold = len({rd.name.split("_fold-")[-1].split("_")[0]
                     for rd in run_dirs if "_fold-" in rd.name}) > 1
    for rd in run_dirs:
        stage = rd.name.split("_stage-")[-1] if "_stage-" in rd.name else "main"
        if multifold:  # 3-fold CV: key per (fold, stage) so streams don't collide
            stage = f"fold{rd.name.split('_fold-')[-1].split('_')[0]}-{stage}"
        if (rd / "metrics.jsonl").exists():
            stages[stage] = _read_jsonl(rd / "metrics.jsonl")
            shutil.copy(rd / "metrics.jsonl", out_dir / f"metrics_stage-{stage}.jsonl")

    # last-epoch learned affines from the final run that dumped artifacts
    affines_pkl = None
    for rd in reversed(run_dirs):
        pkls = sorted(rd.glob("output/val/affines_*.pkl")) or \
            sorted(rd.glob("output/*/affines_*.pkl"))
        if pkls:
            shutil.copy(pkls[-1], out_dir / "affines_final.pkl")
            affines_pkl = pkls[-1]
            break

    if affines_pkl is not None:
        try:
            plot_planes(run_root, affines_pkl, out_dir / "learned_planes.png")
        except Exception as e:  # rendering must never sink the artifact pass
            print(f"learned-plane render failed: {e}")

    plot_curves(stages, out_dir / "training_curves.png")

    summary = {"wall_s": wall_s, "stages": {}}
    for stage, recs in stages.items():
        final = {}
        for rec in recs:
            for k, v in rec.items():
                if k.startswith(("losses/", "scores/")):
                    final[k] = v
        summary["stages"][stage] = {
            "final_train_loss": final.get("losses/train_loss"),
            "final_val_loss": final.get("losses/val_loss"),
            "final_val_dice_oa": final.get(
                "scores/val_mean_oa_exclude_bg_dice"),
            "final_test_dice_oa": final.get(
                "scores/test_mean_oa_exclude_bg_dice"),
            "final_test_dice_per_class": {
                k.rsplit("_", 1)[-1]: v for k, v in final.items()
                if k.startswith("scores/test_mean_dice_")},
        }
    (out_dir / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary, indent=2))


def plot_planes(run_root, affines_pkl, png_path):
    """3D learned-planes-in-heart figure for the first dumped case (the
    matplotlib stand-in for reference visualize_mmwhs.ipynb cells 5-13)."""
    import pickle

    from acquisition_focus_tpu.data.cache import load_or_build
    from acquisition_focus_tpu.data.mrxcat import get_dataset_class
    from acquisition_focus_tpu.engine.config import load_config
    from acquisition_focus_tpu.utils.visualize import plot_learned_planes

    cfg = load_config(str(Path(run_root) / "config.json"))
    with open(affines_pkl, "rb") as f:
        affines = pickle.load(f)
    ds = load_or_build(get_dataset_class(cfg["dataset"][0]), cfg["dataset"][1],
                       cfg, state="train")
    case_id = next(cid for cid in affines if cid in ds.cases)
    case = ds.cases[case_id]
    plot_learned_planes(
        case["label"], case["nii_affine"], affines[case_id], png_path,
        view_names=list(cfg["base_views"]),
        slice_shape=tuple(cfg["slice_fov_vox"][:2]))
    print(f"wrote {png_path} (case {case_id})")


def plot_curves(stages, png_path):
    """Two stacked panels (loss / val Dice), stages laid out on one global epoch
    axis with boundary markers. No dual axes; palette + mark specs per the
    dataviz conventions."""
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    SURFACE, INK, INK2 = "#fcfcfb", "#0b0b0b", "#52514e"
    C_TRAIN, C_VAL, C_DICE = "#2a78d6", "#eb6834", "#1baf7a"

    order = sorted(stages, key=lambda s: (s == "ref", s))  # opt_view0.. then ref
    series = {"train_loss": [], "val_loss": [], "val_dice": []}
    bounds, labels, x0 = [], [], 0
    for stage in order:
        per_epoch = {}
        for rec in stages[stage]:
            step = rec.get("step")
            if step is None:
                continue
            d = per_epoch.setdefault(step, {})
            for key, name in (("losses/train_loss", "train_loss"),
                              ("losses/val_loss", "val_loss"),
                              ("scores/val_mean_oa_exclude_bg_dice", "val_dice")):
                if key in rec:
                    d[name] = rec[key]
        n = 0
        for i, step in enumerate(sorted(per_epoch)):
            for name in series:
                if name in per_epoch[step]:
                    series[name].append((x0 + i, per_epoch[step][name]))
            n = i + 1
        bounds.append((x0, x0 + n))
        labels.append(stage)
        x0 += n

    fig, (ax1, ax2) = plt.subplots(
        2, 1, figsize=(9, 5.6), sharex=True, facecolor=SURFACE,
        gridspec_kw={"hspace": 0.12})
    for ax in (ax1, ax2):
        ax.set_facecolor(SURFACE)
        for side in ("top", "right"):
            ax.spines[side].set_visible(False)
        for side in ("left", "bottom"):
            ax.spines[side].set_color(INK2)
        ax.grid(True, axis="y", color=INK2, alpha=0.15, linewidth=0.6)
        ax.tick_params(colors=INK2, labelsize=8)
        for (lo, hi), name in zip(bounds, labels):
            ax.axvline(lo, color=INK2, alpha=0.3, linewidth=0.8)
    for (lo, hi), name in zip(bounds, labels):
        ax1.text((lo + hi) / 2, 1.02, name, transform=ax1.get_xaxis_transform(),
                 ha="center", fontsize=8, color=INK2)

    def plot(ax, name, color, label):
        pts = series[name]
        if pts:
            xs, ys = zip(*pts)
            ax.plot(xs, ys, color=color, linewidth=2, label=label)

    plot(ax1, "train_loss", C_TRAIN, "train loss")
    plot(ax1, "val_loss", C_VAL, "val loss")
    ax1.set_ylabel("DC+CE loss", fontsize=9, color=INK)
    ax1.legend(frameon=False, fontsize=8, labelcolor=INK, loc="upper right")

    plot(ax2, "val_dice", C_DICE, "val Dice (mean, excl. bg)")
    ax2.set_ylabel("Dice", fontsize=9, color=INK)
    ax2.set_ylim(0, 1)
    ax2.set_xlabel("epoch (stage-sweep global)", fontsize=9, color=INK)
    ax2.legend(frameon=False, fontsize=8, labelcolor=INK, loc="upper left")

    fig.suptitle("Phantom end-to-end stage sweep", fontsize=10, color=INK,
                 y=0.99)
    fig.savefig(png_path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    print(f"wrote {png_path}")


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--spat", type=int, default=128)
    p.add_argument("--fov_mult", type=float, default=1.5)
    p.add_argument("--n_cases", type=int, default=14)
    p.add_argument("--views", nargs="*", default=None,
                   help="base view names; 'RND' gives each view a strong fixed "
                        "random rotation (the degraded-initialization ablation: "
                        "the ref stage keeps the random planes frozen while "
                        "opt_view* stages must recover informative ones)")
    p.add_argument("--base_features", type=int, nargs="*", default=None)
    p.add_argument("--locnet_width", type=int, default=None)
    p.add_argument("--model_type", default=None,
                   help="hybrid-unet (default) | hybrid-EPix2Vox | hybrid-Pix2Vox")
    p.add_argument("--single_stage", action="store_true",
                   help="skip the stage sweep: one fixed-view training run "
                        "(related-works comparison protocol)")
    p.add_argument("--all_folds", action="store_true",
                   help="run the full 3-fold CV instead of fold 0 only")
    p.add_argument("--binarized", action="store_true",
                   help="use_binarized_labels (forced on for (E)Pix2Vox)")
    p.add_argument("--batch", type=int, default=2,
                   help="microbatch size (batch x accum slabs per step; "
                        "EPix2Vox at 128^3 needs batch 1 x accum 4 to fit "
                        "16G HBM)")
    p.add_argument("--accum", type=int, default=2)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU platform (TPU-backend-down fallback)")
    p.add_argument("--metrics_every", type=int, default=5,
                   help="heavy val/test metric-epoch cadence (final epoch "
                        "always measures)")
    p.add_argument("--prescan", type=int, default=None,
                   help="prescan/locnet grid (e.g. 64); None = spat")
    p.add_argument("--theta_refresh", type=int, default=1,
                   help="theta-refresh cadence k (config theta_refresh_every)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data_dir", default=None)
    p.add_argument("--out_dir", default=None)
    p.add_argument("--collect_only", default=None,
                   help="skip training; collect artifacts from this run root")
    a = p.parse_args()
    if a.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if a.collect_only:
        collect_artifacts(a.collect_only, a.out_dir or REPO / "artifacts/e2e_phantom")
    else:
        run(epochs=a.epochs, spat=a.spat, fov_mult=a.fov_mult,
            n_cases=a.n_cases, base_features=a.base_features or None,
            locnet_width=a.locnet_width,
            views=tuple(a.views) if a.views else ("p2CH", "p4CH", "SA-7"),
            compute_dtype=a.compute_dtype, data_dir=a.data_dir, out_dir=a.out_dir,
            model_type=a.model_type, single_stage=a.single_stage,
            all_folds=a.all_folds, binarized=a.binarized,
            batch_size=a.batch, accum=a.accum, metrics_every=a.metrics_every,
            prescan=a.prescan, theta_refresh=a.theta_refresh, seed=a.seed)
