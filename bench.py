"""Benchmark harness: times the flagship jitted training step on the available
device and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: slices/sec/chip on the default MMWHS configuration (3 views, batch 2,
grad-accum 2, 128 cube @192mm, full ATM + hybrid U-Net training step — the hot loop
of SURVEY.md §3.3). vs_baseline compares against BENCH_BASELINE.json: the
measured round-1 *initial* (unoptimized) TPU implementation of the same workload
(the torch reference publishes no throughput numbers and cannot run in this image,
and an XLA-CPU run of the workload does not finish compiling on the 1-core host —
see BASELINE.md and PERF.md).
"""

import json
import time
from pathlib import Path

import numpy as np


def build_workload(compute_dtype='bfloat16'):
    import os
    import jax
    from acquisition_focus_tpu.engine.optimizers import (
        make_reconstruction_optimizer, make_transform_optimizer)
    from acquisition_focus_tpu.engine.train import (
        StageSpec, init_params, make_models, train_step)

    spec = StageSpec(
        n_views=3, num_classes=6, n_active_views=3,
        view_optimization_mode='opt-all', use_affine_theta=True,
        augment_input=True, num_grad_accum_steps=2,
        compute_dtype=compute_dtype,
        atm_remat=os.environ.get('BENCH_ATM_REMAT', '0') == '1',
        unet_remat=os.environ.get('BENCH_UNET_REMAT', '0') == '1')

    unet, atms = make_models(spec)
    unet_params, atm_params = init_params(spec, jax.random.key(0), batch_size=1)
    recon_opt = make_reconstruction_optimizer(1e-3, updates_per_epoch=10)
    trans_opt = make_transform_optimizer(1e-3, epochs=80, updates_per_epoch=10)
    recon_state = recon_opt.init(unet_params)
    trans_state = trans_opt.init(atm_params)

    B, accum, S = 2, spec.num_grad_accum_steps, 128
    rng = np.random.default_rng(0)
    batch = {
        'label': rng.integers(0, 6, size=(accum, B, S, S, S)).astype(np.int32),
        'nii_affine': np.broadcast_to(
            np.diag([1.5, 1.5, 1.5, 1.0]), (accum, B, 4, 4)).astype(np.float32),
        'view_affines': np.broadcast_to(
            np.eye(4), (accum, spec.n_views, B, 4, 4)).astype(np.float32),
    }
    import jax.numpy as jnp
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    state = [unet_params, atm_params, recon_state, trans_state]

    def step(i):
        # train_step donates the state buffers; thread them through
        out = train_step(spec, unet, atms, recon_opt, trans_opt,
                         state[0], state[1], state[2], state[3],
                         batch, jax.random.key(i))
        state[0], state[1], state[2], state[3] = out[0], out[1], out[2], out[3]
        return out[4]['loss']

    n_slices = accum * B * spec.n_views
    return step, n_slices


def time_step(step, n_warmup=1, n_timed=3):
    # float() forces a true device->host round-trip per step: block_until_ready
    # does not reliably block through the axon TPU tunnel (measured sub-dispatch
    # "latencies" without it).
    for i in range(n_warmup):
        float(step(i))
    t0 = time.time()
    for i in range(n_timed):
        float(step(100 + i))
    return (time.time() - t0) / n_timed


def main():
    import jax
    step, n_slices = build_workload()
    step_time = time_step(step)
    slices_per_sec = n_slices / step_time

    baseline_file = Path(__file__).parent / 'BENCH_BASELINE.json'
    vs_baseline = 1.0
    if baseline_file.is_file():
        base = json.loads(baseline_file.read_text())
        vs_baseline = slices_per_sec / base['baseline_slices_per_sec']

    print(json.dumps({
        'metric': 'train_step slices/sec/chip (MMWHS default config: 3 views, '
                  'batch 2, accum 2, 128^3@192mm, full ATM+HybridUnet update)',
        'value': round(slices_per_sec, 3),
        'unit': 'slices/sec/chip',
        'vs_baseline': round(vs_baseline, 2),
        'step_time_s': round(step_time, 4),
        'device': str(jax.devices()[0]),
    }))


if __name__ == '__main__':
    main()
