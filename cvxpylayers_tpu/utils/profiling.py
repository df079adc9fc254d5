"""Observability: phase timers, problem summaries, profiler annotations.

The reference has no tracing/profiling hooks at all (cvxpylayers SURVEY
section 5: "Tracing / profiling: none"); this module adds the per-phase
counters and jax.profiler integration the TPU build plan calls for.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax


class PhaseTimer:
    """Accumulates wall-clock per named phase (canonicalize / compile /
    solve / backward ...). Not thread-safe; one per layer or experiment."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        lines = []
        for k in sorted(self.totals):
            lines.append(
                f"{k}: {self.totals[k]*1e3:.2f} ms over {self.counts[k]} calls"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def trace_annotation(name: str):
    """Named region in jax.profiler traces (viewable in TensorBoard/XProf)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def problem_summary(layer) -> dict:
    """Structured description of a compiled layer's cone program."""
    p = layer.prog
    return {
        "n": p.n,
        "m": p.m,
        "n_param": p.n_param,
        "dims": {
            "zero": p.dims.zero,
            "nonneg": p.dims.nonneg,
            "soc": list(p.dims.soc),
            "exp": p.dims.exp,
            "psd": list(p.dims.psd),
            "pow3": list(p.dims.pow3),
        },
        "nnz_A": int(p.A_rows.size),
        "nnz_P": int(p.P_rows.size),
        "nb": int(p.b_rows.size),
        "objective_offset_exact": bool(p.objective_offset_exact),
        "gp": bool(getattr(layer, "gp", False)),
    }
