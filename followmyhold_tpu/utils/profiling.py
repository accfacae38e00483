"""Lightweight tracing/profiling.

The reference's observability is ad-hoc time.time() prints
(mesh_align.py:184,216-217, hoi_detector.py:295-302). Here: a `span` context
manager accumulating wall times into a process-global registry, a summary
printer, and an opt-in hook into jax.profiler for device traces
(FOHO_TPU_TRACE_DIR -> TensorBoard-loadable traces).
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from typing import Dict, Iterator, Tuple

_SPANS: Dict[str, Tuple[int, float]] = defaultdict(lambda: (0, 0.0))


@contextlib.contextmanager
def span(name: str, block: bool = False) -> Iterator[None]:
    """Time a region. block=True inserts a device sync so the span measures
    actual device work, not dispatch."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if block:
            try:
                import jax

                (jax.device_put(0) + 0).block_until_ready()
            except Exception:
                pass
        n, total = _SPANS[name]
        _SPANS[name] = (n + 1, total + time.perf_counter() - t0)


def summary() -> str:
    lines = ["span                              calls   total_s    mean_ms"]
    for name, (n, total) in sorted(_SPANS.items(), key=lambda kv: -kv[1][1]):
        lines.append(f"{name:<32} {n:>6} {total:>9.3f} {total / max(n,1) * 1e3:>10.2f}")
    return "\n".join(lines)


def reset() -> None:
    _SPANS.clear()


@contextlib.contextmanager
def device_trace(name: str = "trace") -> Iterator[None]:
    """jax.profiler trace when FOHO_TPU_TRACE_DIR is set; no-op otherwise."""
    trace_dir = os.environ.get("FOHO_TPU_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(trace_dir, name)):
        yield
