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


@contextlib.contextmanager
def sync_audit(log: bool = True, capture_stacks: bool = False) -> Iterator[dict]:
    """Count blocking device->host materializations inside a block.

    On a tunneled TPU every implicit pull (``np.asarray`` on a jax array,
    ``float(x)``, ``if device_scalar:``) costs a full round trip, and
    *sequential* pulls dominate pipeline fixed cost. This context manager
    wraps ``jax.Array.__array__`` / ``__float__`` / ``__int__`` /
    ``__bool__`` and ``jax.device_get`` to count them:

        with st.profiler.sync_audit() as audit:
            model.run()
        audit  # {"array": 3, "float": 1, "device_get": 1, "stacks": [...]}

    ``capture_stacks=True`` additionally records a short traceback per event
    so the offending line can be found. Only use for diagnosis (the wrapper
    adds per-call overhead)."""
    import traceback

    import jax

    counts = {"array": 0, "float": 0, "int": 0, "bool": 0, "device_get": 0, "stacks": []}
    cls = type(jax.numpy.zeros(()))
    originals = {}
    # A batched jax.device_get(tree) is ONE round trip regardless of leaf
    # count; suppress the per-leaf __array__ events it triggers internally so
    # counts reflect actual sync points.
    in_get = [False]

    def _wrap(name, key):
        orig = getattr(cls, name, None)
        if orig is None:  # pragma: no cover
            return
        originals[name] = orig

        def wrapped(self, *a, **k):
            if not in_get[0]:
                counts[key] += 1
                if capture_stacks:
                    counts["stacks"].append((key, "".join(traceback.format_stack(limit=8)[:-1])))
            return orig(self, *a, **k)

        setattr(cls, name, wrapped)

    for name, key in (("__array__", "array"), ("__float__", "float"), ("__int__", "int"), ("__bool__", "bool")):
        _wrap(name, key)
    orig_get = jax.device_get

    def wrapped_get(x):
        counts["device_get"] += 1
        if capture_stacks:
            counts["stacks"].append(("device_get", "".join(traceback.format_stack(limit=8)[:-1])))
        in_get[0] = True
        try:
            return orig_get(x)
        finally:
            in_get[0] = False

    jax.device_get = wrapped_get
    try:
        yield counts
    finally:
        jax.device_get = orig_get
        for name, orig in originals.items():
            setattr(cls, name, orig)
        if log:
            total = sum(v for k, v in counts.items() if k != "stacks")
            lm.main_info(
                f"sync_audit: {total} blocking materializations "
                f"(array={counts['array']} float={counts['float']} int={counts['int']} "
                f"bool={counts['bool']} device_get={counts['device_get']})"
            )
