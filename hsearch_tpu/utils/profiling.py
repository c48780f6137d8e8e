"""Phase timing + device tracing.

The reference sprinkles ``clock()`` spans and a TIME_INFO macro around
every phase (motif_both_points.cpp:373,384-386, pcluster util.hpp:179-186);
here the same observability is structured: a ``Phase`` context accumulates
wall-clock per named phase into a registry, and ``device_trace`` wraps
``jax.profiler`` for real TPU traces (SURVEY §5 "TPU equivalent:
jax.profiler traces + per-phase host timers").
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

_REGISTRY: dict[str, list[float]] = defaultdict(list)


def heartbeat(msg: str) -> None:
    """Opt-in progress line (HSEARCH_PROGRESS=1) for multi-hour runs.

    IGC-scale invocations (1e6+ proteins through cluster_proteins, 2^23+
    k-mers through clustering) are otherwise silent until they finish;
    the reference prints per-phase TIME_INFO lines for the same reason
    (pcluster util.hpp:179-186).  Off by default — stderr, timestamped.
    """
    import os
    import sys
    if os.environ.get("HSEARCH_PROGRESS", "0") != "1":
        return
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


@contextlib.contextmanager
def phase(name: str, *, sync: bool = False):
    """Time a phase; optionally block on all device work first and after.

    with profiling.phase("lsh-build", sync=True):
        index = motif.build_index(...)
    """
    if sync:
        # fence pending device work: a tiny transfer completes only after
        # everything already enqueued (effects_barrier only fences
        # effectful computations, not pure async dispatch)
        import jax
        try:
            jax.block_until_ready(jax.device_put(0))
        except Exception:
            pass
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync:
            import jax
            try:
                jax.block_until_ready(jax.device_put(0))
            except Exception:
                pass
        _REGISTRY[name].append(time.perf_counter() - t0)


def add(name: str, seconds: float) -> None:
    """Record an already-measured span (for code where a context manager
    would force re-indentation of a whole constructor body)."""
    _REGISTRY[name].append(seconds)


def report() -> dict[str, dict]:
    """{phase: {count, total_s, mean_s}} for all recorded phases."""
    return {k: {"count": len(v), "total_s": sum(v),
                "mean_s": sum(v) / len(v)}
            for k, v in _REGISTRY.items() if v}


def reset() -> None:
    _REGISTRY.clear()


def print_report(file=None) -> None:
    for name, st in sorted(report().items()):
        line = (f"[TIME] {name}: total {st['total_s']:.3f}s over "
                f"{st['count']} calls (mean {st['mean_s'] * 1000:.1f}ms)")
        print(line, file=file)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace of the enclosed block (view in TensorBoard /
    xprof).  No-op fallback if the profiler is unavailable."""
    import jax
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
