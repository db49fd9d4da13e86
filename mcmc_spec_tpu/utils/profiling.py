"""Tracing & profiling helpers.

The reference's only instrumentation is ad-hoc ``time.time()`` deltas
(``mft6.py:3511-3514`` and commented per-eval timers).  Here:

* :class:`StageTimer` — structured wall-clock stage accounting with a
  compile-vs-run split (first call through a jit is recorded separately).
* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-compatible trace directory for on-chip analysis.
* :func:`device_loop_time` — dispatch-noise-free kernel timing: runs the
  traced computation ``rep`` times inside one ``lax.fori_loop`` on device.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Callable, Dict

import jax
import jax.numpy as jnp


class StageTimer:
    """Accumulates wall-clock per named stage; first hit counted as compile."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.first: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            if name not in self.first:
                self.first[name] = dt  # includes compile
            else:
                self.totals[name] += dt
                self.counts[name] += 1

    def report(self) -> str:
        lines = ["stage                     first(s)   steady(ms/call)   calls"]
        for name in self.first:
            n = self.counts[name]
            steady = self.totals[name] / n * 1e3 if n else float("nan")
            lines.append(f"{name:24s} {self.first[name]:9.2f} {steady:17.3f} {n:7d}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_loop_time(fn: Callable, *args, rep: int = 50) -> float:
    """Seconds per call of ``fn(*args)`` measured inside one device loop.

    ``fn`` must return an array/scalar; inputs are perturbed per iteration so
    the loop body cannot be hoisted.
    """
    @jax.jit
    def run(a0, *rest):
        def body(i, acc):
            return acc + jnp.sum(fn(a0 + 1e-9 * i, *rest)).astype(jnp.float32)

        return jax.lax.fori_loop(0, rep, body, jnp.zeros((), jnp.float32))

    out = run(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / rep
