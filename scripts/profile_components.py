"""Component-level timing of the training step on the real TPU chip.

Times each stage of the hot path (SURVEY.md §3.3) as a separate jitted program with
varying inputs (identical dispatches are cached by the axon tunnel — PERF.md), so the
numbers decompose the full train_step measured by bench.py.

Every timed program reduces its result to ONE scalar inside jit and the harness
``float()``s it: block_until_ready does not reliably block through the axon tunnel,
and an out-of-jit reduce would add a second ~30ms dispatch per repetition.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_components.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def _scalar(out):
    """Reduce an arbitrary pytree to one f32 scalar (traced, fuses into the jit)."""
    return jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(x).astype(jnp.float32), out, jnp.float32(0.0))


def timeit(fn, args_fn, n_warmup=2, n_timed=4):
    for i in range(n_warmup):
        float(fn(*args_fn(i)))
    t0 = time.time()
    for i in range(n_timed):
        float(fn(*args_fn(100 + i)))
    return (time.time() - t0) / n_timed


def main():
    from acquisition_focus_tpu.engine.train import (
        StageSpec, forward, init_params, make_models)
    from acquisition_focus_tpu.models.atm import apply_stacked_atms
    from acquisition_focus_tpu.ops.resample import nifti_grid_sample

    spec = StageSpec(
        n_views=3, num_classes=6, n_active_views=3,
        view_optimization_mode='opt-all', use_affine_theta=True,
        augment_input=True, num_grad_accum_steps=2, compute_dtype='bfloat16')
    unet, atms = make_models(spec)
    unet_params, atm_params = init_params(spec, jax.random.key(0), batch_size=1)

    B, A, C, S = 2, 3, 6, 128
    P = spec.prescan_fov_vox[0]
    rng = np.random.default_rng(0)
    label = jnp.asarray(rng.integers(0, 6, size=(B, S, S, S)), jnp.int32)
    nii = jnp.broadcast_to(jnp.diag(jnp.asarray([1.5, 1.5, 1.5, 1.0])), (B, 4, 4))
    views = jnp.broadcast_to(jnp.eye(4), (A, B, 4, 4))
    onehot = jax.nn.one_hot(label, C, axis=1, dtype=jnp.float32)

    results = {}

    def record(name, value):
        results[name] = value
        print(f"{name:24s} {value * 1e3:9.1f} ms", flush=True)
        sys.stdout.flush()

    # 1. prescan resample: A*B affines sharing B volumes, bf16, 128^3 out
    @jax.jit
    def prescan(vol, nii_, pre):
        out, _, _ = nifti_grid_sample(
            vol.astype(jnp.bfloat16), nii_, jnp.asarray(spec.prescan_fov_mm),
            spec.prescan_fov_vox, is_label=False,
            pre_grid_sample_affine=pre.reshape(-1, 4, 4))
        return _scalar(out)

    record('prescan_resample_fwd', timeit(
        prescan, lambda i: (onehot + i * 1e-6, nii, views)))

    # 2. localization nets fwd and fwd+bwd
    xp_shape = (A, B) + (P, P, P) + (C,)

    def locnet(ap, xp):
        return apply_stacked_atms(
            ap, xp, optim_method=spec.optim_method, prescan_spat=P,
            offset_clip_value=spec.offset_clip_value,
            zoom_clip_value=spec.zoom_clip_value, dtype=spec.dtype)

    xp0 = jnp.asarray(rng.random(xp_shape), spec.dtype)
    record('locnet_fwd', timeit(
        jax.jit(lambda ap, xp: _scalar(locnet(ap, xp))),
        lambda i: (atm_params, xp0 + i * 1e-6)))

    @jax.jit
    def locnet_grad(ap, xp):
        return _scalar(jax.grad(lambda p: locnet(p, xp).sum())(ap))

    record('locnet_fwd_bwd', timeit(
        locnet_grad, lambda i: (atm_params, xp0 + i * 1e-6)))

    # 3. differentiable slice extraction (gather) fwd+bwd w.r.t. affine
    @jax.jit
    def slicer_grad(vol, pre):
        def f(p):
            out, _, _ = nifti_grid_sample(
                vol, nii, jnp.asarray(spec.slice_fov_mm), spec.slice_fov_vox,
                is_label=False, pre_grid_sample_affine=p.reshape(-1, 4, 4))
            return (out.astype(jnp.float32) ** 2).sum()
        return _scalar(jax.grad(f)(pre))

    record('slicer_fwd_bwd', timeit(
        slicer_grad, lambda i: (onehot + i * 1e-6, views)))

    # 4. U-Net fwd and fwd+bwd
    x2d = jnp.asarray(rng.random((B, A * C, S, S)), jnp.float32)
    affs = jnp.broadcast_to(jnp.eye(4), (A, B, 4, 4))

    record('unet_fwd', timeit(
        jax.jit(lambda p, x: _scalar(unet.apply(p, x, affs))),
        lambda i: (unet_params, x2d + i * 1e-6)))

    @jax.jit
    def unet_grad(p, x):
        return _scalar(jax.grad(
            lambda pp: (unet.apply(pp, x, affs).astype(jnp.float32) ** 2).mean())(p))

    record('unet_fwd_bwd', timeit(unet_grad, lambda i: (unet_params, x2d + i * 1e-6)))

    # 4b. level-0 skip connector (Pallas plane resample) fwd and fwd+bwd —
    # ONE view's level-0 call (C=16; the model loops views). The kernel's lane
    # chunking needs YC*C % 128 == 0, which holds for the model's C=16..256
    # but not for arbitrary C.
    from acquisition_focus_tpu.ops.pallas.plane_resample import (
        plane_resample_pallas)
    slc0 = jnp.asarray(rng.random((B, 16, S, S)), jnp.bfloat16)
    aff0 = jnp.broadcast_to(jnp.eye(4), (B, 4, 4)).astype(jnp.float32)

    record('skip0_fwd', timeit(
        jax.jit(lambda s: _scalar(plane_resample_pallas(s, aff0, S))),
        lambda i: (slc0 + np.float32(i * 1e-3),)))

    @jax.jit
    def skip0_grad(s):
        return _scalar(jax.grad(
            lambda ss: (plane_resample_pallas(ss, aff0, S)
                        .astype(jnp.float32) ** 2).sum())(s))

    record('skip0_fwd_bwd', timeit(
        skip0_grad, lambda i: (slc0 + np.float32(i * 1e-3),)))

    # 4c. optimizer update alone (AdamW + schedules over both param trees)
    from acquisition_focus_tpu.engine.optimizers import (
        make_reconstruction_optimizer, make_transform_optimizer)
    recon_opt = make_reconstruction_optimizer(1e-3, updates_per_epoch=10)
    trans_opt = make_transform_optimizer(1e-3, epochs=80, updates_per_epoch=10)
    recon_state = recon_opt.init(unet_params)
    trans_state = trans_opt.init(atm_params)

    @jax.jit
    def opt_update(up, ap, rs, ts, seed):
        ug = jax.tree_util.tree_map(lambda p: p * 1e-6 + seed * 1e-8, up)
        ag = jax.tree_util.tree_map(lambda p: p * 1e-6 + seed * 1e-8, ap)
        uu, rs2 = recon_opt.update(ug, rs, up)
        au, ts2 = trans_opt.update(ag, ts, ap)
        import optax
        return _scalar((optax.apply_updates(up, uu), optax.apply_updates(ap, au)))

    record('opt_update', timeit(
        opt_update,
        lambda i: (unet_params, atm_params, recon_state, trans_state,
                   jnp.float32(i))))

    # 5. full forward (loss) and full grad, single microbatch
    micro = {'label': label, 'nii_affine': nii, 'view_affines': views}

    @jax.jit
    def full_fwd(up, ap, lbl):
        loss, _ = forward(spec, unet, up, atms, ap, {**micro, 'label': lbl},
                          jax.random.key(0), train=True)
        return loss

    record('full_fwd', timeit(
        full_fwd, lambda i: (unet_params, atm_params,
                             jnp.roll(label, i, axis=1))))

    @jax.jit
    def full_grad(up, ap, lbl):
        def f(params):
            u, a = params
            loss, _ = forward(spec, unet, u, atms, a, {**micro, 'label': lbl},
                              jax.random.key(0), train=True)
            return loss
        return _scalar(jax.grad(f)((up, ap)))

    record('full_fwd_bwd', timeit(
        full_grad, lambda i: (unet_params, atm_params, jnp.roll(label, i, axis=1))))


if __name__ == '__main__':
    main()
