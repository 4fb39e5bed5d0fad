"""Micro-probe: per-dispatch cost anatomy on the tunneled backend.

Every search group dispatch passes ~5-7 SMALL host numpy arrays (starts,
ends, use_score, idfs, ks) as jit args next to the big resident device
columns. If the tunnel charges ~30 ms per host->device transfer (not per
execute call), packing the small args into ONE array would cut most of
the per-group dispatch wall. This measures:

  multi   — f(x, a, b, c, d, e): 5 small host args
  packed  — f(x, p): the same 20 KB as one host array
  premove — f(x, a..e) with args device_put FIRST (counts the pure
            execute cost)
  chain   — 8 sequential multi-arg dispatches then one readback (how
            well dispatches pipeline without fetches between)

Run: python -m wiser_tpu.tools.dispatch_probe
"""

from __future__ import annotations

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None):
    from wiser_tpu.utils import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    log("devices:", jax.devices())
    B = 1024
    x = jax.device_put(jnp.arange(1 << 20, dtype=jnp.float32))
    small = [np.random.default_rng(i).integers(
        0, 1000, size=(B,), dtype=np.int32) for i in range(5)]
    packed = np.stack(small)

    @jax.jit
    def f_multi(x, a, b, c, d, e):
        return (x[a].sum() + x[b].sum() + x[c].sum() + x[d].sum()
                + x[e].sum())

    @jax.jit
    def f_packed(x, p):
        return sum(x[p[i]].sum() for i in range(5))

    def timeit(name, fn, reps=20):
        np.asarray(fn())  # compile
        t0 = time.time()
        for _ in range(reps):
            np.asarray(fn())
        dt = (time.time() - t0) / reps * 1e3
        log(f"{name}: {dt:.1f} ms")
        return dt

    timeit("multi  (5 small host args)", lambda: f_multi(x, *small))
    timeit("packed (1 small host arg) ", lambda: f_packed(x, packed))
    d_small = [jax.device_put(jnp.asarray(a)) for a in small]
    timeit("premove (args on device)  ", lambda: f_multi(x, *d_small))

    def chain(n):
        outs = [f_multi(x, *small) for _ in range(n)]
        return np.asarray(jnp.stack(outs))

    for n in (1, 4, 8):
        timeit(f"chain x{n} multi + 1 fetch ", lambda n=n: chain(n), reps=8)

    def chain_packed(n):
        outs = [f_packed(x, packed) for _ in range(n)]
        return np.asarray(jnp.stack(outs))

    for n in (4, 8):
        timeit(f"chain x{n} packed + 1 fetch", lambda n=n: chain_packed(n),
               reps=8)


if __name__ == "__main__":
    main()
