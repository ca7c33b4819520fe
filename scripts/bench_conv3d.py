"""TPU micro-benchmark: XLA conv vs the Pallas direct conv (ops/pallas/conv3d)
on the decoder's full-resolution level (the only level the kernel's W%128==0
guard admits — also where PERF.md's cost map puts the decoder-conv money).

Run on the real chip:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_conv3d.py

Prints fwd and fwd+bwd wall / TF/s per shape for both paths. The decision this
feeds: flip `use_pallas_conv3d` on (engine/config.py) if the Pallas forward
beats XLA at dec0 shapes, else record the floor in PERF.md.
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

from acquisition_focus_tpu.ops.pallas import conv3d as c3

# dec0 convs at reference widths, B=2 (batch 1 x 2 grad-accum micros run B=1;
# bench B=2 and B=1 to cover both)
SHAPES = [
    ("dec0a_B2", (2, 128, 128, 128, 96), 48),
    ("dec0b_B2", (2, 128, 128, 128, 48), 48),
    ("dec0a_B1", (1, 128, 128, 128, 96), 48),
    ("dec0b_B1", (1, 128, 128, 128, 48), 48),
]


def timeit(f, *args, n=10):
    r = f(*args)
    jax.tree_util.tree_map(lambda a: float(jnp.sum(a).astype(jnp.float32)), r)
    t0 = time.time()
    for _ in range(n):
        r = f(*args)
    # tunnel-safe sync (block_until_ready does not block through axon)
    jax.tree_util.tree_map(lambda a: float(jnp.sum(a).astype(jnp.float32)), r)
    return (time.time() - t0) / n


def _phase(label, fn):
    """Run one measurement phase; print its result IMMEDIATELY and never let a
    backend crash (the axon remote-compile service can die mid-run, PERF.md)
    lose the numbers already printed. Each print carries its own wall so the
    compile cost of the phase is visible too."""
    t0 = time.time()
    try:
        msg = fn()
        print(f"{label}: {msg}  [phase wall {time.time() - t0:.0f}s]",
              flush=True)
        return True
    except Exception as e:
        print(f"{label}: FAILED after {time.time() - t0:.0f}s: "
              f"{type(e).__name__}: {str(e)[:200]}", flush=True)
        return False


def main(dtype=jnp.bfloat16, shapes=None, phases=("fwd", "wgrad", "vjp")):
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    for name, xs, co in SHAPES:
        if shapes and name not in shapes:
            continue
        B, D, H, W, Ci = xs
        flops = 2 * B * D * H * W * 27 * Ci * co
        x = jnp.asarray(rng.normal(size=xs), dtype)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, Ci, co)) * 0.1, dtype)
        cot = jnp.asarray(rng.normal(size=(B, D, H, W, co)), dtype)

        fx = jax.jit(c3._xla_conv)
        fp = jax.jit(c3.conv3d_pallas)

        if "fwd" in phases:
            def fwd_xla():
                tx = timeit(fx, x, w)
                main.tx = tx
                return f"{tx*1e3:7.2f} ms ({flops/tx/1e12:5.1f} TF/s)"
            def fwd_pallas():
                tp = timeit(fp, x, w)
                err = float(jnp.max(jnp.abs(
                    (fp(x, w) - fx(x, w)).astype(jnp.float32))))
                sp = f"  speedup {main.tx/tp:4.2f}x" if hasattr(main, 'tx') else ""
                return (f"{tp*1e3:7.2f} ms ({flops/tp/1e12:5.1f} TF/s)"
                        f"{sp}  maxerr {err:.3e}")
            _phase(f"{name}: fwd xla", fwd_xla)
            _phase(f"{name}: fwd pallas", fwd_pallas)

        if "wgrad" in phases:
            def wgrad_pallas():
                fw = jax.jit(c3.conv3d_wgrad_pallas)
                tw = timeit(fw, x, cot, n=5)
                main.tw = tw
                return f"{tw*1e3:7.2f} ms ({flops/tw/1e12:5.1f} TF/s)"
            def wgrad_xla():
                # x/cot MUST be jit arguments: closing over them embeds
                # ~400 MB of HLO constants and crashes the remote-compile
                # service (round-3 broken-pipe incident).
                dwr = jax.jit(jax.grad(
                    lambda w_, x_, c_: (c3._xla_conv(x_, w_) * c_).sum()))
                twx = timeit(dwr, w, x, cot, n=5)
                fw = jax.jit(c3.conv3d_wgrad_pallas)
                werr = float(jnp.max(jnp.abs(
                    fw(x, cot) - dwr(w, x, cot).astype(jnp.float32))))
                sp = (f"  speedup {twx/main.tw:4.2f}x"
                      if hasattr(main, 'tw') else "")
                return (f"{twx*1e3:7.2f} ms ({flops/twx/1e12:5.1f} TF/s)"
                        f"{sp}  maxerr {werr:.3e}")
            _phase(f"{name}: wgrad pallas", wgrad_pallas)
            _phase(f"{name}: wgrad xla", wgrad_xla)

        if "vjp" in phases:
            def vjp_of(conv):
                def f(x_, w_, c_):  # c_ as an argument, not a 200 MB constant
                    y, pull = jax.vjp(conv, x_, w_)
                    return pull(c_)
                return jax.jit(f)
            def vjp_xla():
                gx = timeit(vjp_of(c3._xla_conv), x, w, cot, n=5)
                main.gx = gx
                return f"{gx*1e3:7.2f} ms ({3*flops/gx/1e12:5.1f} TF/s)"
            def vjp_pfwd():
                gp = timeit(vjp_of(c3.conv3d), x, w, cot, n=5)
                sp = f"  speedup {main.gx/gp:4.2f}x" if hasattr(main, 'gx') else ""
                return f"{gp*1e3:7.2f} ms{sp}"
            def vjp_full():
                gg = timeit(vjp_of(c3.conv3d_pg), x, w, cot, n=5)
                sp = f"  speedup {main.gx/gg:4.2f}x" if hasattr(main, 'gx') else ""
                return f"{gg*1e3:7.2f} ms{sp}"
            _phase(f"{name}: fwd+bwd xla", vjp_xla)
            _phase(f"{name}: fwd+bwd pallas-fwd", vjp_pfwd)
            _phase(f"{name}: fwd+bwd all-pallas", vjp_full)


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--f32", action="store_true")
    p.add_argument("--shapes", nargs="*", default=None,
                   help="subset of shape names (default all)")
    p.add_argument("--phases", nargs="*", default=["fwd", "wgrad", "vjp"],
                   choices=["fwd", "wgrad", "vjp"])
    a = p.parse_args()
    main(jnp.float32 if a.f32 else jnp.bfloat16,
         shapes=a.shapes, phases=tuple(a.phases))
