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

Resilience: the measurement runs in a subprocess with bounded retries and
backoff, because the axon TPU tunnel can be transiently unavailable or wedged by
a previously-killed client (PERF.md "operational facts": ~60 s claim latency per
fresh client, ~5 min grant expiry after an abnormal kill). A successful run is
recorded to BENCH_LASTGOOD.json; if every attempt fails, the last known-good
line is re-emitted with "stale": true so a backend hiccup never loses the
round's perf record (round-2 lesson: BENCH_r02.json rc=1, no number).

MFU is reported two ways (both over measured step time / the TPU v5e bf16 peak
of 197 TFLOP/s):
- mfu_vs_v5e_bf16_peak: XLA's cost analysis of the whole compiled step —
  everything XLA executes, including remat recomputes and both optimizers
  (flatters "achieved" work when remat is on);
- mfu_model_flops: theoretical model FLOPs only — 3x the forward pass
  (1 fwd + 2x backward for a conv-dominated net) per microbatch times
  grad-accum, counting no recomputes and no optimizer arithmetic. This is the
  number optimization progress should be judged by.
"""

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent
LASTGOOD = HERE / 'BENCH_LASTGOOD.json'
V5E_PEAK_BF16_FLOPS = 197e12  # TPU v5e (v5 lite) peak dense bf16


def _parse_conv3d_mode(env):
    """BENCH_PALLAS_CONV3D -> Conv3x3x3.use_pallas, rejecting typos up front
    (a misspelled mode must not silently bench the default fwd config)."""
    if env in ('0', 'false', 'False'):
        return False
    if env in ('1', 'true', 'True'):
        return True
    if env in ('fwd', 'wg', 'dx', 'full') or \
            (env[:3] == 'fwd' and env[3:].isdigit()):
        return env
    raise SystemExit(
        f"BENCH_PALLAS_CONV3D={env!r} is not a known mode "
        "(0/1/fwd/fwdN/wg/dx/full)")


def build_workload(compute_dtype='bfloat16'):
    import jax
    from acquisition_focus_tpu.engine.optimizers import (
        make_reconstruction_optimizer, make_transform_optimizer)
    from acquisition_focus_tpu.engine.train import (
        StageSpec, init_params, make_models, train_step)

    opt_mode = os.environ.get('BENCH_OPT_MODE', 'opt-all')
    if opt_mode not in ('opt-all', 'opt-current-fix-previous', 'opt-none'):
        raise SystemExit(f"BENCH_OPT_MODE={opt_mode!r} is not a known mode")
    # BENCH_PRESCAN=64 (etc.) shrinks the localization-net input grid at
    # constant physical FOV (192mm): the locnet is the single largest step
    # bucket (561 ms of its 1.82 s at 128^3, PERF.md) and its input is a
    # stop-grad prescan whose resolution is a config axis the reference
    # itself ablates (32^3@6mm meta variants). Recipe change -> needs the
    # Dice-parity sweep before becoming a default.
    prescan = int(os.environ.get('BENCH_PRESCAN', '128'))
    spec = StageSpec(
        n_views=3, num_classes=6, n_active_views=3,
        prescan_fov_vox=(prescan, prescan, prescan),
        # default 'opt-all' (every locnet trained) for continuity with the
        # BENCH_BASELINE series; BENCH_OPT_MODE=opt-current-fix-previous
        # measures the standard stage-sweep step, where frozen views' locnet
        # backward is structurally pruned (models/atm.py train_mask)
        view_optimization_mode=opt_mode, use_affine_theta=True,
        augment_input=True,
        # BENCH_ACCUM/BENCH_BATCH reshape the microbatching at constant
        # slices/step (accum x B = 4 default): accum 1 x B 4 runs one wider
        # fwd+bwd instead of two sequential scan passes
        num_grad_accum_steps=int(os.environ.get('BENCH_ACCUM', '2')),
        compute_dtype=compute_dtype,
        atm_remat=os.environ.get('BENCH_ATM_REMAT', '0') == '1',
        unet_remat=os.environ.get('BENCH_UNET_REMAT', '0') == '1',
        use_pallas_conv3d=_parse_conv3d_mode(
            os.environ.get('BENCH_PALLAS_CONV3D', 'fwd')),
        # e.g. BENCH_DECODER_SAVE=conv_out,conv_in — which marked activations
        # the decoder remat policy stores (see StageSpec.decoder_save_names)
        decoder_save_names=tuple(
            os.environ.get('BENCH_DECODER_SAVE',
                           'conv_out,conv_in0').split(',')))

    # BENCH_THETA_CADENCE=k (k > 1) measures the theta-refresh-cadence recipe
    # (config `theta_refresh_every`): per k steps, 1 full step (locnet trained)
    # + (k-1) cached-theta steps (no locnet traced) + the amortized per-sample
    # theta_pass snapshot cost. Reported value is the blended slices/sec.
    theta_cadence = int(os.environ.get('BENCH_THETA_CADENCE', '1'))

    unet, atms = make_models(spec)
    unet_params, atm_params = init_params(spec, jax.random.key(0), batch_size=1)
    recon_opt = make_reconstruction_optimizer(1e-3, updates_per_epoch=10)
    trans_opt = make_transform_optimizer(1e-3, epochs=80, updates_per_epoch=10)
    recon_state = recon_opt.init(unet_params)
    trans_state = trans_opt.init(atm_params)

    B, accum, S = int(os.environ.get('BENCH_BATCH', '2')), \
        spec.num_grad_accum_steps, 128
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

    def make_step(step_spec, step_batch):
        def step(i):
            # train_step donates the state buffers; thread them through
            out = train_step(step_spec, unet, atms, recon_opt, trans_opt,
                             state[0], state[1], state[2], state[3],
                             step_batch, jax.random.key(i))
            state[0], state[1], state[2], state[3] = \
                out[0], out[1], out[2], out[3]
            return out[4]['loss']
        return step

    step = make_step(spec, batch)
    cadence_parts = None
    if theta_cadence > 1:
        import dataclasses
        from acquisition_focus_tpu.engine.train import theta_pass
        spec_cached = dataclasses.replace(spec, theta_source='cached')
        cbatch = dict(batch, thetas=jnp.broadcast_to(
            jnp.eye(4), (accum, spec.n_views, B, 4, 4)).astype(jnp.float32))
        step_cached = make_step(spec_cached, cbatch)
        micro1 = {'label': batch['label'][0, :1],
                  'nii_affine': batch['nii_affine'][0, :1],
                  'view_affines': batch['view_affines'][0][:, :1]}

        def theta_one(i):
            th = theta_pass(spec, state[1], micro1)
            return th.sum()
        cadence_parts = (step_cached, theta_one, theta_cadence)

    def _lowered_flops(lowered):
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):  # older jax returns [dict]
            cost = cost[0] if cost else {}
        return float(cost.get('flops', 0.0)) or None

    def flops_per_step():
        """XLA-counted FLOPs of one compiled train_step (cache-hit lower)."""
        lowered = train_step.lower(
            spec, unet, atms, recon_opt, trans_opt,
            state[0], state[1], state[2], state[3], batch, jax.random.key(0))
        return _lowered_flops(lowered)

    def model_flops_per_step():
        """Theoretical model FLOPs of one step: 3x the forward pass (1 fwd +
        2x for the dx/dw backward of a conv-dominated net), per microbatch,
        times grad-accum — counting neither remat recomputes nor optimizer
        arithmetic, so the derived MFU tracks model work, not schedule
        artifacts (round-3 verdict item 9)."""
        from acquisition_focus_tpu.engine.train import eval_step
        micro = {k: v[0] for k, v in batch.items()}
        lowered = eval_step.lower(spec, unet, atms, state[0], state[1],
                                  micro, jax.random.key(0), with_aug=False)
        fwd = _lowered_flops(lowered)
        return 3.0 * accum * fwd if fwd else None

    n_slices = accum * B * spec.n_views
    return step, n_slices, flops_per_step, model_flops_per_step, cadence_parts


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


def measure(on_base_record=None):
    import jax
    (step, n_slices, flops_per_step, model_flops_per_step,
     cadence_parts) = build_workload()
    step_time = time_step(step)
    cadence_detail = {}
    if cadence_parts is not None:
        # blended step over one cadence cycle: 1 full + (k-1) cached steps,
        # plus the per-sample theta snapshot amortized over the cycle's steps
        # (one snapshot of every sample per k epochs == samples-per-step/k
        # theta_pass calls per step)
        step_cached, theta_one, k = cadence_parts
        t_cached = time_step(step_cached)
        t_theta = time_step(theta_one, n_warmup=1, n_timed=5)
        samples_per_step = n_slices // 3
        blended = ((step_time + (k - 1) * t_cached) / k
                   + t_theta * samples_per_step / k)
        cadence_detail = {
            'theta_cadence': k,
            'full_step_time_s': round(step_time, 4),
            'cached_step_time_s': round(t_cached, 4),
            'theta_pass_per_sample_s': round(t_theta, 4),
        }
        step_time = blended
    slices_per_sec = n_slices / step_time

    baseline_file = HERE / 'BENCH_BASELINE.json'
    vs_baseline = 1.0
    if baseline_file.is_file():
        base = json.loads(baseline_file.read_text())
        vs_baseline = slices_per_sec / base['baseline_slices_per_sec']

    record = {
        'metric': 'train_step slices/sec/chip (MMWHS default config: 3 views, '
                  'batch 2, accum 2, 128^3@192mm, full ATM+HybridUnet update)',
        'value': round(slices_per_sec, 3),
        'unit': 'slices/sec/chip',
        'vs_baseline': round(vs_baseline, 2),
        'step_time_s': round(step_time, 4),
        'device': str(jax.devices()[0]),
        **cadence_detail,
    }
    # the timed measurement is complete here — surface it BEFORE the FLOPs
    # cost-analysis passes, which each recompile the step through the remote
    # tunnel and can dominate the worker's wall time. A worker killed during
    # enrichment has still delivered its number.
    if on_base_record is not None:
        on_base_record(record)
    try:
        flops = flops_per_step()
    except Exception as e:  # cost analysis must never sink the number
        print(f'cost_analysis failed: {e}', file=sys.stderr)
        flops = None
    if flops:
        achieved = flops / step_time
        record.update({
            'flops_per_step': round(flops, 1),
            'achieved_tflops': round(achieved / 1e12, 2),
            'mfu_vs_v5e_bf16_peak': round(achieved / V5E_PEAK_BF16_FLOPS, 4),
        })
    try:
        model_flops = model_flops_per_step()
    except Exception as e:
        print(f'model-flops cost_analysis failed: {e}', file=sys.stderr)
        model_flops = None
    if model_flops:
        # honest MFU: theoretical fwd+bwd model FLOPs only (no remat
        # recomputes, no optimizer arithmetic) over the same measured step
        achieved_m = model_flops / step_time
        record.update({
            'model_flops_per_step': round(model_flops, 1),
            'model_achieved_tflops': round(achieved_m / 1e12, 2),
            'mfu_model_flops': round(achieved_m / V5E_PEAK_BF16_FLOPS, 4),
        })
    return record


def worker_main():
    # print the timed measurement the moment it exists (the FLOPs enrichment
    # recompiles the step twice through the remote tunnel and can take minutes)
    # and the enriched record after; the orchestrator keeps the LAST line, and
    # salvages the first from a worker killed mid-enrichment.
    rec = measure(on_base_record=lambda r: print(json.dumps(r), flush=True))
    print(json.dumps(rec), flush=True)


def parse_json_line(text):
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith('{'):
            try:
                rec = json.loads(line)
                if 'metric' in rec and 'value' in rec:
                    return rec
            except json.JSONDecodeError:
                continue
    return None


def emit_startup_stale_line():
    """Print the last known-good record IMMEDIATELY, before any live attempt.

    The driver runs `python bench.py` under an external ~1200 s timeout and
    parses the last JSON line of stdout. Round-4 lesson (BENCH_r04.json
    rc=124, parsed=null): one wedged-backend attempt can eat the whole
    window, and a stale-fallback that only prints *after* all attempts is
    then never reached. Emitting the stale line first makes the perf record
    un-loseable — a later live line supersedes it as the last JSON line."""
    if LASTGOOD.is_file():
        rec = json.loads(LASTGOOD.read_text())
        rec['stale'] = True
        rec['stale_reason'] = (
            'preliminary last-known-good emitted at startup; superseded by '
            'the live measurement line below if one completes')
        print(json.dumps(rec), flush=True)


def orchestrate(attempts, worker_timeout, backoffs, record=True):
    emit_startup_stale_line()
    for i in range(attempts):
        try:
            proc = subprocess.run(
                [sys.executable, str(HERE / 'bench.py'), '--worker'],
                capture_output=True, text=True, timeout=worker_timeout,
                cwd=str(HERE))
            # parse stdout regardless of rc: the worker prints its timed
            # measurement BEFORE the FLOPs enrichment, so a crash (or kill)
            # mid-enrichment has still delivered a valid number
            rec = parse_json_line(proc.stdout)
            if rec is not None:
                rec['stale'] = False
                if proc.returncode != 0:
                    rec['partial'] = ('worker exited rc=%d after the timed '
                                      'measurement (FLOPs enrichment lost)'
                                      % proc.returncode)
                if record:
                    LASTGOOD.write_text(json.dumps(rec, indent=2))
                print(json.dumps(rec))
                return 0
            err = (proc.stderr or proc.stdout or '').strip().splitlines()
            print(f'bench attempt {i + 1}/{attempts} failed '
                  f'(rc={proc.returncode}): {err[-1] if err else "?"}',
                  file=sys.stderr)
        except subprocess.TimeoutExpired as e:
            # the killed worker may wedge the chip grant; the backoff below
            # outlasts the ~5 min grant expiry (PERF.md). Salvage the timed
            # measurement if the worker got that far before the SIGKILL.
            out = e.stdout
            if isinstance(out, bytes):
                out = out.decode(errors='replace')
            rec = parse_json_line(out or '')
            if rec is not None:
                rec['stale'] = False
                rec['partial'] = (f'worker SIGKILLed at the {worker_timeout}s '
                                  'cap after the timed measurement (FLOPs '
                                  'enrichment lost)')
                if record:
                    LASTGOOD.write_text(json.dumps(rec, indent=2))
                print(json.dumps(rec))
                return 0
            print(f'bench attempt {i + 1}/{attempts} timed out '
                  f'after {worker_timeout}s', file=sys.stderr)
        if i + 1 < attempts:
            wait = backoffs[min(i, len(backoffs) - 1)]
            print(f'backing off {wait}s before retry', file=sys.stderr)
            time.sleep(wait)

    if LASTGOOD.is_file():
        rec = json.loads(LASTGOOD.read_text())
        rec['stale'] = True
        rec['stale_reason'] = (
            f'all {attempts} live attempts failed (backend unavailable); '
            're-emitting last known-good measurement')
        print(json.dumps(rec))
        return 0
    print('no live measurement and no BENCH_LASTGOOD.json', file=sys.stderr)
    return 1


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--worker', action='store_true',
                   help='run one measurement in-process (no retry wrapper)')
    # healthy worker measured 2026-08-20: 6m11s total — ~5 min to the timed
    # measurement (claim + compiles + steps), then ~70 s of FLOPs-enrichment
    # recompiles; the worker prints the timed record the moment it exists and
    # the orchestrator salvages it from killed workers. The DRIVER runs this
    # script under its own ~1200 s timeout (BENCH_r04.json: rc=124 after
    # exactly 1200 s), so the whole orchestration must fit inside ~1100 s:
    # 2 attempts x 480 s + 90 s backoff = 1050 s worst case. Timed-out
    # workers are SIGKILLed by subprocess.run (SIGTERM is pended while a
    # client blocks in a PJRT call — PERF.md operational facts), and the
    # startup stale line above guarantees the driver parses a record even if
    # we are killed mid-run.
    p.add_argument('--attempts', type=int, default=2)
    p.add_argument('--worker_timeout', type=int, default=480)
    p.add_argument('--no-record', action='store_true',
                   help='experiment run: print the measurement but do not '
                        'overwrite BENCH_LASTGOOD.json (the default-config '
                        'record the driver and stale-fallback rely on)')
    a = p.parse_args(argv)
    if a.worker:
        worker_main()
        return 0
    return orchestrate(a.attempts, a.worker_timeout, backoffs=(90,),
                       record=not a.no_record)


if __name__ == '__main__':
    sys.exit(main())
