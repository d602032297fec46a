"""Timing and profiling.

(reference: per-kernel wall-clock accumulators inside the solver struct,
ecg.h:87-98 tot/comm/trsm/gemm/... sampled around every MKL call, plus
min/max/avg across ranks via preAlps_dstats_display, preAlps_utils.c:720.)

TPU-native: device code is fully fused under jit, so per-kernel host timers
are meaningless inside the loop; instead we provide (1) host-phase timers for
setup/build/solve stages, (2) jax.profiler trace capture around solves
(named scopes mark the solver phases), and (3) per-iteration cost derived
from the on-device residual history length.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from dataclasses import dataclass, field

import jax


@dataclass
class Timers:
    """Accumulating host-side phase timers (the ECGPrint analog)."""

    acc: dict = field(default_factory=lambda: defaultdict(float))
    count: dict = field(default_factory=lambda: defaultdict(int))

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.acc[name] += time.perf_counter() - t0
            self.count[name] += 1

    def summary(self) -> str:
        lines = ["=== Timings ==="]
        for name in sorted(self.acc):
            lines.append(
                f"  {name:<20s} {self.acc[name]:10.4f} s  (x{self.count[name]})"
            )
        return "\n".join(lines)

    def as_dict(self):
        return dict(self.acc)


@contextlib.contextmanager
def timed(timers: Timers | None, name: str):
    if timers is None:
        yield
    else:
        with timers.time(name):
            yield


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """Capture a jax.profiler trace around a block (view with TensorBoard /
    xprof). No-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def scope(name: str):
    """Named profiler scope decorator for jitted phases."""
    return jax.named_scope(name)


def scan_differential_ms(fn, z0, k_short: int = 40, k_long: int = 200,
                         reps: int = 2) -> float:
    """Honest per-application time (ms) of `fn` on this backend.

    The remote-attach TPU runtime elides repeated identical dispatches and
    caches (executable, input) results, and host-side chaining is dispatch-
    rate bound through the tunnel (docs/PERFORMANCE.md round 3). This
    measures a data-dependent chain INSIDE one dispatch at two scan
    lengths, differenced to cancel constant overhead, with a fresh input
    per timed call.

    fn: pytree -> any. The chain feeds a data-dependent perturbation of the
    INPUT forward (z * (1 + 1e-30·Σfn(z)) — exact in f32, unfoldable), so
    fn need not be shape-preserving. Adds one output reduction per step
    (~0.02 ms at 148k-row outputs).
    """
    import time as _time

    import jax.numpy as jnp

    def step(z, _):
        y = fn(z)
        leaves = jax.tree_util.tree_leaves(y)
        s = sum(jnp.sum(l).astype(jnp.float32) for l in leaves)
        bump = (1.0 + 1e-30 * s)
        return jax.tree_util.tree_map(lambda a: a * bump.astype(a.dtype), z), None

    import functools as _ft

    @_ft.partial(jax.jit, static_argnums=1)
    def many(z, k):
        z, _ = jax.lax.scan(step, z, None, length=k)
        return z

    def best(k, z):
        b = 1e9
        for _ in range(reps):
            t0 = _time.time()
            z = many(z, k)
            jax.block_until_ready(z)
            b = min(b, _time.time() - t0)
        return b, z

    z = many(z0, k_short)
    jax.block_until_ready(z)
    t_s, z = best(k_short, z)
    t_l, _ = best(k_long, z)
    ms = (t_l - t_s) / (k_long - k_short) * 1e3
    if ms <= 0.0:
        # non-positive differential = the measurement was invalidated by
        # host contention; retry once, then report NaN rather than a
        # fabricated finite number (callers divide by this — a floored
        # value would record absurd throughputs as real datapoints)
        t_s, z = best(k_short, z)
        t_l, _ = best(k_long, z)
        ms = (t_l - t_s) / (k_long - k_short) * 1e3
        if ms <= 0.0:
            return float("nan")
    return ms
