"""Tracing/profiling helpers — the observability subsystem.

The reference has no profiler or timing instrumentation (SURVEY §5).  We wrap
jax.profiler so any engine call or training loop can emit a TensorBoard/
Perfetto trace, plus a lightweight wall-clock scope logger.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from pathlib import Path

import jax


@contextlib.contextmanager
def device_trace(log_dir: str | Path, host_tracer_level: int | None = None):
    """Capture an XLA device trace (open with TensorBoard or Perfetto).

        with device_trace("/tmp/mmdx_trace"):
            engine.classify_batch(imgs, texts)

    ``host_tracer_level=0`` disables host-side TraceMe events — necessary for
    device-op attribution through the axon tunnel, whose per-RPC host chatter
    can hit the JSON exporter's 1M-event cap and crowd every device op out of
    the exported trace (observed: 1,000,000 host events, 0 device events).
    """
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    opts = None
    if host_tracer_level is not None:
        opts = jax.profiler.ProfileOptions()
        opts.host_tracer_level = host_tracer_level
    jax.profiler.start_trace(str(log_dir), profiler_options=opts)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-span inside a device trace (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class Timings:
    """Host-side wall-clock scopes with aggregate stats."""

    def __init__(self):
        self.records: dict[str, list[float]] = defaultdict(list)

    @contextlib.contextmanager
    def scope(self, name: str, sync: bool = False, result=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync and result is not None:
                jax.block_until_ready(result)
            self.records[name].append(time.perf_counter() - t0)

    def summary(self) -> dict[str, dict[str, float]]:
        out = {}
        for name, xs in self.records.items():
            xs_sorted = sorted(xs)
            out[name] = {
                "count": len(xs),
                "total_s": sum(xs),
                "mean_ms": 1e3 * sum(xs) / len(xs),
                "p50_ms": 1e3 * xs_sorted[len(xs) // 2],
                "max_ms": 1e3 * xs_sorted[-1],
            }
        return out
