"""Dataset layer: NIfTI loading, geometric precompute, batch iteration.

Capability port of /root/reference/acquisition_focus/datasets/base_dataset.py:25-342,
re-organized TPU-first: everything that is constant per case is computed ONCE at
dataset build (hires resample, clinical view affines, centroid reorientation,
prescan, and — beyond the reference — the centroid-reoriented training volume and
per-view input grid affines that the reference recomputed every step,
run_dl.py:238-259). The training step then consumes ready device arrays.

Split layout, id parsing and fold construction match the reference's
``metadata/data_split.json`` format (base_dataset.py:46, main_acquisition_focus.py:143-170).
"""

import json
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from acquisition_focus_tpu.data.nifti_io import load_nifti
from acquisition_focus_tpu.geometry.centroids import register_centroids
from acquisition_focus_tpu.geometry.clinical_views import (
    get_clinical_cardiac_view_affines)
from acquisition_focus_tpu.ops.resample import nifti_grid_sample
from acquisition_focus_tpu.ops.rotations import random_affine
import jax


def _prescan_quality(seg, gt, nii_affine, num_classes):
    """Dice / HD95 of the (hires-interpolated) segmented prescan against the hires
    GT — the reference's build-time quality gate for from-segmented runs
    (base_dataset.py:287-298, which also compares at hires resolution). HD95 in mm
    via the voxel-diagonal norm of the comparison grid's affine, matching the
    runner's eval convention."""
    from acquisition_focus_tpu.engine.metrics import hausdorff_per_class
    from acquisition_focus_tpu.ops.affine import affine_zooms
    seg, gt = np.asarray(seg), np.asarray(gt)
    dice = np.full(num_classes, np.nan)
    for c in range(1, num_classes):
        p, t = seg == c, gt == c
        denom = p.sum() + t.sum()
        if denom > 0:
            dice[c] = 2.0 * np.logical_and(p, t).sum() / denom
    zoom_norm = float(np.linalg.norm(np.asarray(
        affine_zooms(jnp.asarray(nii_affine, jnp.float32)[None]))[0]))
    hd95 = hausdorff_per_class(seg[None], gt[None], num_classes,
                               percentile=95)[0] * zoom_norm
    return {
        'dice': dice, 'hd95': hd95,
        'dice_mean': float(np.nanmean(dice[1:])),
        'hd95_mean': (float(np.nanmean(hd95[1:]))
                      if np.any(~np.isnan(hd95[1:])) else float('nan')),
    }


class BaseDataset:
    label_tags = ("background", "MYO", "LV", "RV", "LA", "RA")

    def __init__(self, data_base_dir, config, state='train', segment_fn=None,
                 debug=False):
        self.data_base_dir = Path(data_base_dir)
        self.config = config
        self.state = state
        self.debug = debug
        self.segment_fn = segment_fn
        if config.get('use_binarized_labels'):
            self.label_tags = ("background", "foreground")

        with open(self.data_base_dir / "metadata/data_split.json") as f:
            self.data_split = json.load(f)

        self.cases = {}
        if state != 'empty':
            self._load()

    # -- subclass hooks ----------------------------------------------------
    @staticmethod
    def get_file_id(file_path):
        raise NotImplementedError

    def extract_3d_id(self, file_id):
        return file_id

    def set_segment_fn(self, fold_idx):
        """Frozen-segmenter hook for from-segmented modes; wired by subclasses when a
        segmenter checkpoint is configured (reference nnunetv2_utils.py:521-535)."""
        self.segment_fn = None

    # -- id bookkeeping (reference base_dataset.py:77-93) ------------------
    def get_3d_ids(self):
        return sorted(self.cases.keys())

    def switch_3d_identifiers(self, identifiers):
        if isinstance(identifiers, (np.ndarray,)):
            identifiers = identifiers.tolist()
        if not isinstance(identifiers, (list, tuple)):
            identifiers = [identifiers]
        ids = self.get_3d_ids()
        if all(isinstance(i, (int, np.integer)) for i in identifiers):
            return [ids[i] for i in identifiers]
        return [ids.index(i) if i in ids else None for i in identifiers]

    def __len__(self):
        return len(self.cases)

    # -- load + precompute -------------------------------------------------
    def _files_for_state(self):
        if self.state == 'train':
            files = self.data_split['train_files']
        elif self.state == 'test':
            files = self.data_split['test_files']
        else:
            raise ValueError(self.state)
        if self.debug:
            files = files[:8]
        return files

    def _reference_heart_label(self, shape):
        """Canonical heart for centroid registration. The upstream repo ships a
        ref_heart.nii.gz artifact (base_dataset.py:192); here a deterministic
        canonical phantom serves as the fixed label unless config.centroid_ref_path
        points at a NIfTI."""
        ref_path = self.config.get('centroid_ref_path')
        if ref_path:
            lbl, _ = load_nifti(ref_path)
            return lbl.astype(np.int32)
        from acquisition_focus_tpu.data.synthetic import make_heart_phantom
        lbl, _, _ = make_heart_phantom(shape=tuple(shape), seed=42, tilt=0.0)
        return lbl

    def _load(self):
        cfg = self.config
        class_dict = {tag: idx for idx, tag in enumerate(
            ("background", "MYO", "LV", "RV", "LA", "RA"))}
        hires_mm = jnp.asarray(cfg['hires_fov_mm'], jnp.float32)
        hires_vox = tuple(cfg['hires_fov_vox'])
        prescan_mm = jnp.asarray(cfg['prescan_fov_mm'], jnp.float32)
        prescan_vox = tuple(cfg['prescan_fov_vox'])

        img_paths, lbl_paths = {}, {}
        for f in self._files_for_state():
            fid, is_label = self.get_file_id(f)
            (lbl_paths if is_label else img_paths)[fid] = self.data_base_dir / f
        pair_ids = sorted(set(img_paths) & set(lbl_paths))

        ref_heart = None
        for fid in pair_ids:
            case = {}
            img, img_aff = load_nifti(img_paths[fid], dtype=np.float32)
            lbl, lbl_aff = load_nifti(lbl_paths[fid])
            lbl = lbl.astype(np.int32)

            # resample both to the hires FOV (reference base_dataset.py:204-213)
            hires_lbl, _, hires_nii = nifti_grid_sample(
                jnp.asarray(lbl)[None, None], jnp.asarray(lbl_aff, jnp.float32)[None],
                hires_mm, hires_vox, is_label=True)
            hires_img, _, _ = nifti_grid_sample(
                jnp.asarray(img)[None, None], jnp.asarray(img_aff, jnp.float32)[None],
                hires_mm, hires_vox, is_label=False)
            hires_lbl = np.asarray(hires_lbl[0, 0], np.int32)
            hires_img = np.asarray(hires_img[0, 0], np.float32)
            hires_nii = np.asarray(hires_nii[0], np.float64)
            hires_img = (hires_img - hires_img.mean()) / max(hires_img.std(), 1e-8)

            if cfg.get('use_binarized_labels'):
                case_label = (hires_lbl > 0).astype(np.int32)
            else:
                case_label = hires_lbl

            # clinical view affines from GT (base_dataset.py:228-231)
            view_affines = get_clinical_cardiac_view_affines(
                hires_lbl, hires_nii, class_dict,
                num_sa_slices=cfg.get('num_sa_slices', 15), return_unrolled=True)

            # canonical orientation via centroid registration (base_dataset.py:232-233)
            if ref_heart is None:
                ref_heart = self._reference_heart_label(hires_vox)
            centroids_aff = np.asarray(
                register_centroids(ref_heart, hires_lbl, dof=6,
                                   seed=cfg.get('seed', 0)), np.float64)
            view_affines['centroids'] = centroids_aff

            # prescan (base_dataset.py:241-250)
            prescan_lbl, _, prescan_nii = nifti_grid_sample(
                jnp.asarray(hires_lbl)[None, None],
                jnp.asarray(hires_nii, jnp.float32)[None],
                prescan_mm, prescan_vox, is_label=True)
            case['prescan_gt'] = np.asarray(prescan_lbl[0, 0], np.int32)
            case['prescan_nii_affine'] = np.asarray(prescan_nii[0], np.float64)

            if cfg.get('clinical_view_affine_type') == 'from-segmented':
                assert self.segment_fn is not None, (
                    "clinical_view_affine_type='from-segmented' needs a segmenter: "
                    "configure segment_model_path (set_segment_fn was not wired)")
                prescan_img, _, _ = nifti_grid_sample(
                    jnp.asarray(hires_img)[None, None],
                    jnp.asarray(hires_nii, jnp.float32)[None],
                    prescan_mm, prescan_vox, is_label=False)
                seg = np.asarray(self.segment_fn(
                    np.asarray(prescan_img[0, 0]),
                    case['prescan_nii_affine']), np.int32)
                case['prescan_label'] = seg
                prescan_views = get_clinical_cardiac_view_affines(
                    seg, case['prescan_nii_affine'], class_dict,
                    num_sa_slices=cfg.get('num_sa_slices', 15), return_unrolled=True)
                # interpolate the segmented prescan back to the hires grid: the
                # canonical base is registered on the hires-interpolated
                # segmentation (reference base_dataset.py:280 registers tmp.int()),
                # which also keeps registration and hires volume in the SAME
                # normalized [-1,1] grid space regardless of prescan FOV
                seg_hires, _, _ = nifti_grid_sample(
                    jnp.asarray(seg)[None, None],
                    jnp.asarray(case['prescan_nii_affine'], jnp.float32)[None],
                    hires_mm, hires_vox, is_label=True)
                seg_hires = np.asarray(seg_hires[0, 0], np.int32)
                prescan_views['centroids'] = np.asarray(
                    register_centroids(ref_heart, seg_hires, dof=6,
                                       seed=cfg.get('seed', 0)), np.float64)
                case['prescan_view_affines'] = prescan_views
                # prescan quality gate vs GT at HIRES resolution / hires affine
                # norm — comparable to the reference's logged numbers
                # (base_dataset.py:287-298 compares the hires-interpolated seg)
                case['prescan_quality'] = _prescan_quality(
                    seg_hires, hires_lbl, hires_nii, len(self.label_tags))
                print(f"  {fid} prescan dice="
                      f"{case['prescan_quality']['dice_mean']:.3f} hd95="
                      f"{case['prescan_quality']['hd95_mean']:.2f}mm")
                # enforced build-time quality gate (reference logs these at
                # base_dataset.py:287-298; its nnU-Net oracle lands at ~0.805
                # Dice on MMWHS — get_run_data.ipynb cell 11). A prescan whose
                # segmentation is this wrong would silently poison every
                # downstream view plane, so fail the build loudly instead.
                q = case['prescan_quality']
                min_dice = cfg.get('min_prescan_dice', 0.5)
                max_hd95 = cfg.get('max_prescan_hd95_mm', 12.0)
                if (q['dice_mean'] < min_dice
                        or (np.isfinite(q['hd95_mean'])
                            and q['hd95_mean'] > max_hd95)):
                    raise RuntimeError(
                        f"{fid}: segmented prescan quality below the build "
                        f"gate (dice {q['dice_mean']:.3f} < {min_dice} or "
                        f"hd95 {q['hd95_mean']:.2f}mm > {max_hd95}mm) — "
                        "train the segmenter longer (scripts/"
                        "train_segmenter.py) or lower min_prescan_dice/"
                        "max_prescan_hd95_mm explicitly")
            else:
                case['prescan_label'] = case['prescan_gt']
                prescan_views = get_clinical_cardiac_view_affines(
                    case['prescan_label'], case['prescan_nii_affine'], class_dict,
                    num_sa_slices=cfg.get('num_sa_slices', 15), return_unrolled=True)
                prescan_views['centroids'] = view_affines['centroids']
                case['prescan_view_affines'] = prescan_views

            case['gt_view_affines'] = view_affines
            case['nifti_affine'] = hires_nii

            # — TPU precompute: centroid-reoriented training volume + per-view input
            #   grid affines (the reference recomputes these per step,
            #   run_dl.py:238-259,266-279). The chosen view-affine source — GT or
            #   segmented prescan — supplies BOTH the canonical base and the view
            #   planes (reference run_dl.py:243-248) —
            chosen_views = (case['prescan_view_affines']
                            if cfg.get('clinical_view_affine_type')
                            == 'from-segmented' else view_affines)
            base = chosen_views['centroids']
            r_lbl, _, r_nii = nifti_grid_sample(
                jnp.asarray(case_label)[None, None],
                jnp.asarray(hires_nii, jnp.float32)[None],
                hires_mm, hires_vox, is_label=True,
                pre_grid_sample_affine=jnp.asarray(base, jnp.float32)[None])
            r_img, _, _ = nifti_grid_sample(
                jnp.asarray(hires_img)[None, None],
                jnp.asarray(hires_nii, jnp.float32)[None],
                hires_mm, hires_vox, is_label=False,
                pre_grid_sample_affine=jnp.asarray(base, jnp.float32)[None])
            case['label'] = np.asarray(r_lbl[0, 0], np.int32)
            case['image'] = np.asarray(r_img[0, 0], np.float32)
            case['nii_affine'] = np.asarray(r_nii[0], np.float32)
            case['input_view_affines'] = self._input_view_affines(chosen_views)

            self.cases[self.extract_3d_id(fid)] = case

    def _input_view_affines(self, chosen_views):
        """(V, 4, 4) input grid affines for the configured base views:
        inv(centroid base) @ view affine, both taken from the chosen source dict
        (GT or segmented-prescan, reference run_dl.py:227-234,243-248); 'RND'
        views get a fixed strong random rotation (learnable_transform.py:133)."""
        cfg = self.config
        base_inv = np.linalg.inv(chosen_views['centroids'])
        affs = []
        for v_idx, name in enumerate(cfg['base_views']):
            if name == 'RND':
                aff = np.asarray(random_affine(
                    jax.random.key(cfg.get('seed', 0) + 1000 + v_idx),
                    rotation_strength=4.0, zoom_strength=0.0), np.float64)
            else:
                aff = base_inv @ np.asarray(chosen_views[name], np.float64)
            affs.append(aff)
        return np.stack(affs).astype(np.float32)

    # -- batch construction ------------------------------------------------
    def get_case(self, case_id):
        return self.cases[case_id]

    def make_batch(self, case_ids):
        """Collate cases into a batch dict of stacked numpy arrays (B, ...)."""
        cases = [self.cases[c] for c in case_ids]
        return {
            'label': np.stack([c['label'] for c in cases]),
            'image': np.stack([c['image'] for c in cases]),
            'nii_affine': np.stack([c['nii_affine'] for c in cases]),
            # (V, B, 4, 4)
            'view_affines': np.stack(
                [c['input_view_affines'] for c in cases], axis=1),
        }

    def iterate_train_macrobatches(self, idxs, batch_size, accum_steps, rng):
        """Shuffled macrobatches with leading (accum, B, ...) axes; drops the last
        incomplete macrobatch (reference uses drop_last=True, run_dl.py:628-630)."""
        ids = self.switch_3d_identifiers(list(idxs))
        order = rng.permutation(len(ids))
        macro = batch_size * accum_steps
        for start in range(0, len(ids) - macro + 1, macro):
            sel = [ids[i] for i in order[start:start + macro]]
            batch = self.make_batch(sel)
            yield sel, {
                k: v.reshape((accum_steps, batch_size) + v.shape[1:])
                if k != 'view_affines' else
                v.reshape((v.shape[0], accum_steps, batch_size) + v.shape[2:])
                .transpose(1, 0, 2, 3, 4)
                for k, v in batch.items()
            }

    def iterate_eval_batches(self, idxs, batch_size):
        ids = self.switch_3d_identifiers(list(idxs)) if idxs is not None \
            else self.get_3d_ids()
        for start in range(0, len(ids), batch_size):
            sel = ids[start:start + batch_size]
            yield sel, self.make_batch(sel)
