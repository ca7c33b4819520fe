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


def main(dtype=jnp.bfloat16):
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    for name, xs, co in SHAPES:
        B, D, H, W, Ci = xs
        flops = 2 * B * D * H * W * 27 * Ci * co
        x = jnp.asarray(rng.normal(size=xs), dtype)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, Ci, co)) * 0.1, dtype)
        cot = jnp.asarray(rng.normal(size=(B, D, H, W, co)), dtype)

        fx = jax.jit(c3._xla_conv)
        fp = jax.jit(c3.conv3d_pallas)
        tx = timeit(fx, x, w)
        tp = timeit(fp, x, w)
        err = float(jnp.max(jnp.abs((fp(x, w) - fx(x, w)).astype(jnp.float32))))
        print(f"{name}: fwd xla {tx*1e3:7.2f} ms ({flops/tx/1e12:5.1f} TF/s)  "
              f"pallas {tp*1e3:7.2f} ms ({flops/tp/1e12:5.1f} TF/s)  "
              f"speedup {tx/tp:4.2f}x  maxerr {err:.3e}", flush=True)

        def vjp_of(conv):
            def f(x_, w_):
                y, pull = jax.vjp(conv, x_, w_)
                return pull(cot)
            return jax.jit(f)

        fw = jax.jit(c3.conv3d_wgrad_pallas)
        tw = timeit(fw, x, cot, n=5)
        dwr = jax.jit(jax.grad(lambda w_: (c3._xla_conv(x, w_) * cot).sum()))
        twx = timeit(dwr, w, n=5)
        werr = float(jnp.max(jnp.abs(fw(x, cot) - dwr(w).astype(jnp.float32))))
        print(f"{name}: wgrad xla {twx*1e3:7.2f} ms ({flops/twx/1e12:5.1f} TF/s)  "
              f"pallas {tw*1e3:7.2f} ms ({flops/tw/1e12:5.1f} TF/s)  "
              f"speedup {twx/tw:4.2f}x  maxerr {werr:.3e}", flush=True)

        gx = timeit(vjp_of(c3._xla_conv), x, w, n=5)
        gp = timeit(vjp_of(c3.conv3d), x, w, n=5)
        gg = timeit(vjp_of(c3.conv3d_pg), x, w, n=5)
        print(f"{name}: fwd+bwd xla {gx*1e3:7.2f} ms ({3*flops/gx/1e12:5.1f} TF/s)  "
              f"pallas-fwd {gp*1e3:7.2f} ms  all-pallas {gg*1e3:7.2f} ms  "
              f"speedup {gx/gp:4.2f}x / {gx/gg:4.2f}x", flush=True)


if __name__ == "__main__":
    main(jnp.float32 if "--f32" in sys.argv else jnp.bfloat16)
