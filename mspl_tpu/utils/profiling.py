"""Tracing / profiling utilities (SURVEY.md §5 "Tracing / profiling": the
reference prints FLOPs/param counts at model build and wall-clock per epoch;
the TPU-native plan adds a `jax.profiler` trace server + per-step timing).

* `model_parameters` / `estimate_flops` — build-time model cards (the
  reference's `model_parameters`/`compute_flops` surface).
* `StepTimer` — wall-clock per-step statistics with `block_until_ready`
  semantics for honest device timing.
* `trace` — context manager writing a TensorBoard-viewable profile
  (tensorboard-plugin-profile) via jax.profiler.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Optional

import jax
import numpy as np


def model_parameters(params) -> int:
    """Total parameter count of a params pytree."""
    return int(sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params)))


def estimate_flops(fn, *args) -> Optional[float]:
    """Static USEFUL-FLOP estimate of a jittable fn via XLA cost analysis.

    Lowers with grouped-conv densification disabled (the production path
    pads grouped 1x1s to block-diagonal dense, whose cost analysis would
    overstate grouped-layer FLOPs by the group factor); the flag only
    affects this lowering, never an executed program.
    Returns None if the backend doesn't expose cost analysis."""
    from mspl_tpu.ops import grouped_conv

    prev = grouped_conv.DENSIFY_GROUPED
    grouped_conv.DENSIFY_GROUPED = False
    try:
        analysis = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(analysis, list):  # older jax returns [dict]
            analysis = analysis[0]
        return float(analysis.get("flops", None)) if analysis else None
    except Exception:
        return None
    finally:
        grouped_conv.DENSIFY_GROUPED = prev


def device_sync(tree) -> None:
    """Force FULL completion of `tree`'s computation via a tiny host fetch.

    On this environment's remote-TPU (axon) backend, ``jax.block_until_ready``
    can return before a chain of dependent dispatches (e.g. a train-step loop
    threading its state) has finished, silently inflating throughput numbers
    ~20x in one measured case.  Fetching one element round-trips the runtime
    and is reliable.  Use this instead of ``block_until_ready`` when timing.

    One element is fetched from EVERY leaf: leaves of the same tree may come
    from separate dispatches, and fetching only the first would leave the
    others in flight (outside this remote-TPU environment plain
    ``jax.block_until_ready`` remains the simpler default).
    """
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "ravel"):
            np.asarray(leaf.ravel()[0:1])


class StepTimer:
    """Accumulates per-step wall-clock times; `summary()` gives mean/p50/p95.

    Usage:
        timer = StepTimer()
        with timer.step():
            out = train_step(...)
            device_sync(out)   # NOT block_until_ready — see device_sync
    """

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {"steps": 0}
        t = np.asarray(self.times)
        return {
            "steps": int(t.size),
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p95_s": float(np.percentile(t, 95)),
            "total_s": float(t.sum()),
        }


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device profile viewable in TensorBoard's profile plugin."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_profiler_server(port: int = 9012) -> None:
    """On-demand profiling of a live run (SURVEY.md §5 plan)."""
    jax.profiler.start_server(port)
