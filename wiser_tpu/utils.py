"""Tracing/profiling utilities — the aux-subsystem analog of the
reference's gperftools hooks (vacuum_engine.h:173-179 ProfilerStart behind
-profile_vacuum, Makefile google-pprof targets) and its tab-separated
ResultTable output (utils.h:112-143).

- PhaseTimer: named wall-clock phases with a report table.
- trace(): context manager around jax.profiler for device traces viewable
  in XProf/TensorBoard (the CPU-profiler analog).
- ResultTable: tab-separated experiment rows.
"""

from __future__ import annotations

import contextlib
import time
from collections import OrderedDict
from typing import Dict, List


def enable_compile_cache(cache_dir: str = None) -> str:
    """Persistent XLA compilation cache — first-compile on this stack
    costs tens of seconds per shape bucket; the cache makes that a
    once-per-machine cost instead of once-per-process."""
    import os

    import jax

    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "wiser_tpu_xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return cache_dir


class PhaseTimer:
    def __init__(self):
        self.totals: "OrderedDict[str, float]" = OrderedDict()
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        rows = ["phase\ttotal_s\tcalls\tavg_ms"]
        for name, tot in self.totals.items():
            n = self.counts[name]
            rows.append(f"{name}\t{tot:.3f}\t{n}\t{1000*tot/n:.2f}")
        return "\n".join(rows)


@contextlib.contextmanager
def trace(log_dir: str):
    """Device trace capture (jax.profiler); view with xprof/tensorboard.
    The -profile_vacuum / ProfilerStart analog."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ResultTable:
    """reference: utils::ResultTable/ResultRow (utils.h:112-143) —
    tab-separated rows with a header derived from the union of keys."""

    def __init__(self):
        self.rows: List[Dict[str, object]] = []

    def add_row(self, **kv) -> None:
        self.rows.append(kv)

    def to_str(self) -> str:
        cols: List[str] = []
        for r in self.rows:
            for k in r:
                if k not in cols:
                    cols.append(k)
        out = ["\t".join(cols)]
        for r in self.rows:
            out.append("\t".join(str(r.get(c, "NA")) for c in cols))
        return "\n".join(out)


# The axon terminal's remote-compile helper reproducibly dies (HTTP 500,
# subprocess exit 1) or wedges the worker when several first-time
# compiles arrive CONCURRENTLY (io-worker pools + main thread each
# dispatching fresh shape buckets). serial_jit serializes only the
# FIRST call of each jitted function (= its compile) through one
# process-wide lock; warm calls bypass the lock entirely, so
# steady-state dispatch parallelism is untouched.
_COMPILE_LOCK = None


def serial_jit(fn, **jit_kwargs):
    import threading

    import jax

    global _COMPILE_LOCK
    if _COMPILE_LOCK is None:
        _COMPILE_LOCK = threading.Lock()
    jitted = jax.jit(fn, **jit_kwargs)
    done = threading.Event()

    def wrapper(*a, **k):
        if done.is_set():
            return jitted(*a, **k)
        with _COMPILE_LOCK:
            out = jitted(*a, **k)
        done.set()
        return out

    wrapper.__wrapped__ = jitted
    return wrapper
