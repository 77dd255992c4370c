"""Tracing / profiling hooks.

The reference has no built-in timing (its examples shell out to `time`,
run/run_monortm_examples:23) and only version-stamp provenance strings
(monortm.f90:308,591-619).  Here the equivalents are first-class:

- `named_scope(name)` — annotates traced computations so XLA/TPU profiler
  timelines show physics stages (line sum, continuum, RT) by name.
- `StageTimer` — host-side wall-clock accounting per pipeline stage;
  rendered into MONORTM.LOG so every run carries its own timing table.
- `profile_trace(dir)` — context manager around `jax.profiler.trace`,
  producing a TensorBoard-loadable device trace when requested.
"""

from __future__ import annotations

import contextlib
import time


def named_scope(name: str):
    """jax.named_scope if jax is importable, else a no-op context."""
    try:
        import jax
        return jax.named_scope(name)
    except Exception:                                    # pragma: no cover
        return contextlib.nullcontext()


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """Device profiler trace (TensorBoard format) when log_dir is set."""
    if not log_dir:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield


class StageTimer:
    """Accumulates wall time per named stage; repeated stages sum."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            with named_scope(name):
                yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        if not self.totals:
            return ""
        width = max(len(k) for k in self.totals)
        lines = [" STAGE TIMING (wall seconds)"]
        for k, v in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            lines.append(f"   {k:<{width}s} {v:10.3f}  (x{self.counts[k]})")
        return "\n".join(lines) + "\n"
