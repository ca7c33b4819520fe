"""Runner-level integration tests on a tiny on-disk phantom dataset:

- full-state checkpointing: train(4) == train(2) + resume(2) bit-for-bit on params
  (reference saves model+optimizers+scheduler+scaler, run_dl.py:704-713);
- mesh-sharded data-parallel training through the REAL entry point matches the
  single-device run (new TPU capability, SURVEY.md §5.8/§7).
"""

import json

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from acquisition_focus_tpu.engine.checkpoint import load_checkpoint, save_checkpoint
from acquisition_focus_tpu.engine.config import DotDict, load_config
from acquisition_focus_tpu.engine.runner import _unflatten_like, run_dl


SPAT = 32
FOV = SPAT * 1.5


@pytest.fixture(scope='session')
def phantom_dir(tmp_path_factory):
    from acquisition_focus_tpu.data.synthetic import write_phantom_dataset
    root = tmp_path_factory.mktemp('phantom')
    # 8 cases, 2 held out as test -> 6 train-state cases (indices 0..5)
    write_phantom_dataset(root, n_cases=8, shape=(48, 48, 48))
    return root


def make_config(tmp_path, **overrides):
    cfg = load_config(overrides=dict(
        epochs=2, batch_size=1, num_grad_accum_steps=1, val_batch_size=1,
        base_views=['p2CH'], n_active_views=1,
        view_optimization_mode='opt-all', use_affine_theta=True,
        hires_fov_mm=[FOV] * 3, hires_fov_vox=[SPAT] * 3,
        slice_fov_mm=[FOV, FOV, 1.5], slice_fov_vox=[SPAT, SPAT, 1],
        prescan_fov_mm=[FOV] * 3, prescan_fov_vox=[SPAT] * 3,
        compute_dtype='float32', num_sa_slices=3, metrics_every=1000,
        do_output=False, save_every=1, use_caching=False,
        # skinny widths: identical program structure, ~50x fewer FLOPs on CPU
        base_features=[4, 4, 8, 8, 8, 8], locnet_width=4,
        log_dir=str(tmp_path / 'runs'), mdl_save_prefix=str(tmp_path / 'models'),
    ))
    cfg.update(overrides)
    return DotDict(cfg)


@pytest.fixture(scope='session')
def phantom_dataset_factory(phantom_dir):
    from acquisition_focus_tpu.data.mmwhs import MMWHSDataset
    built = {}

    def get(cfg):
        key = json.dumps({k: cfg.get(k) for k in
                          ('hires_fov_vox', 'base_views')}, default=str)
        if key not in built:
            built[key] = MMWHSDataset(phantom_dir, cfg, state='train')
        return built[key]
    return get


def leaves_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return len(la) == len(lb) and all(
        np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(la, lb))


def test_empty_decoder_save_names_is_honored(tmp_path):
    """An explicit [] means 'save nothing' (pure recompute); only a MISSING
    key falls back to the ('conv_out', 'conv_in0') default (advisor item)."""
    from acquisition_focus_tpu.engine.runner import spec_from_config
    cfg = make_config(tmp_path, decoder_save_names=[])
    spec = spec_from_config(cfg, num_classes=6, n_active_views=1)
    assert spec.decoder_save_names == ()
    cfg_default = make_config(tmp_path)
    spec_default = spec_from_config(cfg_default, num_classes=6,
                                    n_active_views=1)
    assert spec_default.decoder_save_names == ('conv_out', 'conv_in0')


def test_optax_state_checkpoint_roundtrip(tmp_path):
    """Optimizer states survive the flatten-to-leaves checkpoint encoding."""
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adamw(optax.exponential_decay(1e-3, 10, 0.9)))
    params = {'w': jnp.ones((3, 2)), 'b': jnp.zeros((2,))}
    state = opt.init(params)
    # advance the schedule/moments so the state is non-trivial
    for i in range(3):
        g = jax.tree_util.tree_map(lambda p: p * 0.1 + i, params)
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)

    save_checkpoint(tmp_path / 'ck', dict(
        leaves=jax.tree_util.tree_leaves(state)))
    loaded = load_checkpoint(tmp_path / 'ck')
    template = opt.init(params)
    restored = _unflatten_like(template, loaded['leaves'])
    assert leaves_equal(restored, state)
    # and the restored state drives identical updates
    g = jax.tree_util.tree_map(lambda p: p * 0.05, params)
    u1, _ = opt.update(g, state, params)
    u2, _ = opt.update(g, restored, params)
    assert leaves_equal(u1, u2)


@pytest.mark.slow
def test_exact_resume(tmp_path, phantom_dataset_factory):
    cfg = make_config(tmp_path, epochs=4)
    ds = phantom_dataset_factory(cfg)
    fold = (0, (list(range(4)), [5]))

    pa = run_dl(str(tmp_path), cfg.copy(), fold, training_dataset=ds,
                test_dataset=None, run_name='full4')

    # pause after 2 of 4 epochs (schedules stay functions of epochs=4), resume
    cfg2 = make_config(tmp_path, epochs=4, stop_at_epoch=2)
    pb = run_dl(str(tmp_path), cfg2.copy(), fold, training_dataset=ds,
                test_dataset=None, run_name='part2')
    cfg3 = make_config(tmp_path, epochs=4, model_checkpoint_path=pb)
    pc = run_dl(str(tmp_path), cfg3.copy(), fold, training_dataset=ds,
                test_dataset=None, run_name='resumed')

    full = load_checkpoint(pa)
    resumed = load_checkpoint(pc)
    assert int(resumed['epoch']) == int(full['epoch']) == 3
    assert leaves_equal(full['unet_params'], resumed['unet_params'])
    assert leaves_equal(full['atm_params'], resumed['atm_params'])
    assert leaves_equal(full['recon_opt_leaves'], resumed['recon_opt_leaves'])
    assert leaves_equal(full['trans_opt_leaves'], resumed['trans_opt_leaves'])


@pytest.mark.slow
def test_theta_cadence_runs_and_freezes_atms_between_refreshes(
        tmp_path, phantom_dataset_factory):
    """theta_refresh_every=2: epochs 1 (cached) must not move ATM params;
    epoch 2 (refresh) must. The run must complete with finite losses."""
    cfg = make_config(tmp_path, epochs=3, theta_refresh_every=2,
                      save_every=1)
    ds = phantom_dataset_factory(cfg)
    fold = (0, (list(range(4)), [5]))
    p = run_dl(str(tmp_path), cfg.copy(), fold, training_dataset=ds,
               test_dataset=None, run_name='cadence')
    ck = load_checkpoint(p)
    assert int(ck['epoch']) == 2
    # per-epoch ATM movement: re-run epoch-by-epoch via stop_at_epoch pauses
    cfg_a = make_config(tmp_path / 'steps', epochs=3, theta_refresh_every=2,
                        stop_at_epoch=1)
    pa = run_dl(str(tmp_path / 'steps'), cfg_a.copy(), fold,
                training_dataset=ds, test_dataset=None, run_name='e0')
    cfg_b = make_config(tmp_path / 'steps', epochs=3, theta_refresh_every=2,
                        stop_at_epoch=2, model_checkpoint_path=pa)
    pb = run_dl(str(tmp_path / 'steps'), cfg_b.copy(), fold,
                training_dataset=ds, test_dataset=None, run_name='e1')
    a, b = load_checkpoint(pa), load_checkpoint(pb)
    # epoch 1 is a cached epoch (1 % 2 == 1): ATMs frozen
    assert leaves_equal(a['atm_params'], b['atm_params'])
    assert not leaves_equal(a['unet_params'], b['unet_params'])


@pytest.mark.slow
def test_mesh_dp_matches_single_device(tmp_path, phantom_dataset_factory):
    assert len(jax.devices()) >= 2, "conftest provides 8 virtual CPU devices"
    base = dict(epochs=2, batch_size=2)
    cfg_one = make_config(tmp_path / 'one', **base)
    cfg_dp = make_config(tmp_path / 'dp', **base, mesh_shape={'data': 2})
    ds = phantom_dataset_factory(cfg_one)
    fold = (0, (list(range(4)), [5]))

    p1 = run_dl(str(tmp_path / 'one'), cfg_one, fold, training_dataset=ds,
                test_dataset=None, run_name='one')
    p2 = run_dl(str(tmp_path / 'dp'), cfg_dp, fold, training_dataset=ds,
                test_dataset=None, run_name='dp')

    # Parity lives in loss space, not parameter space: the sharded psum's
    # reduction order differs from the single-device sum by float ulps, and
    # Adam normalizes updates by gradient magnitude — an ulp-level gradient
    # difference can flip a whole normalized update for a near-zero-gradient
    # leaf. Measured here: epoch-0 losses bit-identical, epoch-1 within 3e-4,
    # while individual parameter leaves diverge by their own (tiny) scale.
    def loss_track(run_dir, name):
        track = {}
        with open(run_dir / 'runs' / name / 'metrics.jsonl') as f:
            for line in f:
                rec = json.loads(line)
                for k in ('losses/train_loss', 'losses/val_loss'):
                    if k in rec:
                        track[(rec['step'], k)] = rec[k]
        return track

    t1 = loss_track(tmp_path / 'one', 'one')
    t2 = loss_track(tmp_path / 'dp', 'dp')
    assert t1.keys() == t2.keys() and len(t1) == 4  # 2 epochs x train+val
    for key, v1 in t1.items():
        assert abs(v1 - t2[key]) < 2e-3, (key, v1, t2[key])
    # First-epoch agreement: the epoch-0 train loss is a mean over the epoch's
    # steps, which includes post-update forwards — so even epoch 0 carries one
    # Adam update whose normalized direction amplifies ulp-level SPMD
    # reduction-order differences (measured 1.5e-4 after the blocked-norm
    # moment rewrite; bit-identical before it). Parity is enforced at 2e-3 on
    # every tracked loss above; this tighter check guards only against gross
    # batch-sharding mistakes (dropped/duplicated samples land at >1e-2).
    first = min(s for s, _ in t1)
    assert abs(t1[(first, 'losses/train_loss')]
               - t2[(first, 'losses/train_loss')]) < 1e-3
