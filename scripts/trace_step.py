"""Device-trace cost map of the flagship train_step on the real TPU chip.

Runs the bench.py workload under ``jax.profiler.trace`` and prints a ranked
cost map of device events (the tooling behind PERF.md's per-subsystem tables).
Event durations are summed per HLO op name across the traced steps; args carry
HLO source lines + provenance, which is how costs are attributed to subsystems
(locnet / skip connector / decoder convs / metrics / ...).

The axon tunnel supports jax.profiler.trace (PERF.md); the trace lands in
plugins/profile/<ts>/*.trace.json.gz under --out_dir.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/trace_step.py \
      [--steps 2] [--out_dir /tmp/jax_trace] [--top 60] [--group]

--group buckets events into subsystems by provenance regex and prints the
per-subsystem totals (the PERF.md table form).
"""

import argparse
import gzip
import json
import re
import sys
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run_traced(out_dir, steps):
    import jax

    from bench import build_workload

    step, n_slices, _ = build_workload()
    for i in range(2):  # compile + steady-state warmup outside the trace
        float(step(i))
    with jax.profiler.trace(str(out_dir)):
        for i in range(steps):
            float(step(100 + i))
    return steps


def newest_trace(out_dir):
    traces = sorted(Path(out_dir).rglob('*.trace.json.gz'),
                    key=lambda p: p.stat().st_mtime)
    if not traces:
        raise FileNotFoundError(f'no *.trace.json.gz under {out_dir}')
    return traces[-1]


def load_device_events(trace_path):
    """-> list of (name, self_dur_us, args) for events on the device "XLA Ops"
    lane. Ops nest (scan body inside while, branch ops inside conditional), so
    durations are converted to EXCLUSIVE self-time via interval nesting —
    otherwise envelopes double-count everything they contain."""
    with gzip.open(trace_path, 'rt') as f:
        data = json.load(f)
    events = data.get('traceEvents', [])
    names, tnames = {}, {}
    for ev in events:
        if ev.get('ph') == 'M':
            if ev.get('name') == 'process_name':
                names[ev['pid']] = ev.get('args', {}).get('name', '')
            elif ev.get('name') == 'thread_name':
                tnames[(ev['pid'], ev.get('tid'))] = \
                    ev.get('args', {}).get('name', '')
    lanes = defaultdict(list)
    for ev in events:
        if ev.get('ph') != 'X' or 'dur' not in ev:
            continue
        if 'TPU' not in names.get(ev['pid'], ''):
            continue
        if tnames.get((ev['pid'], ev.get('tid'))) != 'XLA Ops':
            continue
        lanes[(ev['pid'], ev.get('tid'))].append(ev)

    out = []
    for lane in lanes.values():
        # nesting stack: children subtract their duration from the parent
        lane.sort(key=lambda e: (e['ts'], -e['dur']))
        stack = []  # (end_ts, name, args, remaining_self_dur)
        for ev in lane:
            ts, dur = float(ev['ts']), float(ev['dur'])
            while stack and stack[-1][0] <= ts + 1e-9:
                end, nm, ar, self_dur = stack.pop()
                out.append((nm, self_dur, ar))
            if stack:
                stack[-1][3] -= dur
            stack.append([ts + dur, ev.get('name', '?'),
                          ev.get('args', {}), dur])
        while stack:
            end, nm, ar, self_dur = stack.pop()
            out.append((nm, self_dur, ar))
    return out


# Subsystem buckets keyed on HLO op-name / provenance substrings. The HLO names
# carry the jit scope (e.g. 'jit(train_step)/.../ConvNet_0/...'); fall back to
# op-kind buckets when no scope survives fusion.
BUCKETS = (
    ('locnet', r'ConvNet|LocalizationNet|s2d|space_to_depth'),
    ('skip_connector', r'plane_resample|sample_slice|SkipConnector|skip'),
    ('prescan_kernel', r'volume_resample|prescan'),
    ('decoder_conv', r'conv3d|decoder|dec[0-9]|transpose_conv|ConvTranspose'),
    ('conv_generic', r'convolution|conv'),
    ('metrics', r'argmax|dice|one_hot|metric'),
    ('optimizer', r'adam|optimizer|opt_state'),
    ('copies_transposes', r'copy|transpose|bitcast|reshape'),
    ('collectives_dma', r'all-reduce|fusion.*dma|dynamic-slice|dynamic-update'),
)


def bucket_of(name, args):
    hay = name
    for key in ('long_name', 'source', 'tf_op', 'hlo_op'):
        v = args.get(key)
        if isinstance(v, str):
            hay += ' ' + v
    for bucket, pat in BUCKETS:
        if re.search(pat, hay, re.I):
            return bucket
    return 'other'


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--steps', type=int, default=2)
    p.add_argument('--out_dir', default='/tmp/jax_trace')
    p.add_argument('--top', type=int, default=60)
    p.add_argument('--group', action='store_true')
    p.add_argument('--parse_only', default=None,
                   help='skip running; parse this trace file (or dir)')
    p.add_argument('--bucket', default=None,
                   help='restrict the top-ops table to one subsystem bucket')
    a = p.parse_args(argv)

    steps = a.steps
    if a.parse_only:
        path = Path(a.parse_only)
        trace = path if path.is_file() else newest_trace(path)
    else:
        run_traced(a.out_dir, steps)
        trace = newest_trace(a.out_dir)
    print(f'trace: {trace}', file=sys.stderr)

    events = load_device_events(trace)
    per_name = defaultdict(lambda: [0.0, 0, {}])
    for name, dur, args in events:
        rec = per_name[name]
        rec[0] += dur
        rec[1] += 1
        if not rec[2]:
            rec[2] = args
    total_us = sum(v[0] for v in per_name.values())
    print(f'{len(events)} device events, {total_us / 1e3 / steps:.1f} '
          f'ms/step total device time ({steps} steps)')

    ranked = sorted(per_name.items(), key=lambda kv: -kv[1][0])
    if a.bucket:
        ranked = [kv for kv in ranked
                  if bucket_of(kv[0], kv[1][2]) == a.bucket]
        in_bucket = sum(kv[1][0] for kv in ranked)
        print(f'bucket {a.bucket}: {in_bucket / 1e3 / steps:.1f} ms/step '
              f'across {len(ranked)} distinct ops')
    print(f'\n== top {a.top} ops (summed) ==')
    for name, (dur, n, args) in ranked[:a.top]:
        extra = ''
        for key in ('long_name', 'source'):
            if isinstance(args.get(key), str):
                extra = ' | ' + args[key][:110]
                break
        print(f'{dur / 1e3 / steps:9.2f} ms/step  x{n:<4d} {name[:90]}{extra}')

    if a.group:
        per_bucket = defaultdict(float)
        for name, (dur, n, args) in per_name.items():
            per_bucket[bucket_of(name, args)] += dur
        print('\n== subsystem buckets ==')
        for bucket, dur in sorted(per_bucket.items(), key=lambda kv: -kv[1]):
            print(f'{dur / 1e3 / steps:9.2f} ms/step  {bucket}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
