"""First-class tracing/profiling (SURVEY §5.1: the reference has only tqdm
progress bars; this framework exposes `jax.profiler` traces and per-kernel
wall timing as a supported subsystem).

Usage:
    with st.profiler.timer("morpho EM"):
        model.run()                      # logs "... took 1.23 s"

    with st.profiler.trace("/tmp/jax-trace"):
        fused_kernel(x)                  # XLA trace viewable in TensorBoard/Perfetto

    st.profiler.report()                 # table of accumulated timings
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, List, Optional, Tuple

from .logging import logger_manager as lm

_TIMINGS: Dict[str, List[float]] = defaultdict(list)


@contextlib.contextmanager
def timer(name: str, log: bool = True, block: bool = True) -> Iterator[None]:
    """Wall-time a code block; with `block=True` (default) a JAX barrier runs
    before stopping the clock so async dispatch doesn't hide device time."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if block:
            try:
                import jax

                jax.effects_barrier()
            except Exception:
                pass
        dt = time.perf_counter() - t0
        _TIMINGS[name].append(dt)
        if log:
            lm.main_info(f"{name} took {dt:.3f} s")


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture an XLA/TPU profiler trace into `log_dir` (open with
    TensorBoard's profile plugin or Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Decorator: wrap a function in both a named jax.profiler annotation
    (visible inside traces) and the wall timer."""
    import functools

    import jax

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            with jax.profiler.TraceAnnotation(name), timer(name, log=False):
                return fn(*args, **kwargs)

        return wrapped

    return deco


def timings() -> Dict[str, List[float]]:
    """Raw accumulated timings (name -> list of seconds)."""
    return dict(_TIMINGS)


def reset() -> None:
    _TIMINGS.clear()


def report() -> List[Tuple[str, int, float, float]]:
    """(name, calls, total_s, mean_s) rows, logged and returned."""
    rows = []
    for name, ts in sorted(_TIMINGS.items(), key=lambda kv: -sum(kv[1])):
        rows.append((name, len(ts), sum(ts), sum(ts) / len(ts)))
        lm.main_info(f"{name}: {len(ts)} calls, total {sum(ts):.3f} s, mean {sum(ts)/len(ts):.3f} s")
    return rows
