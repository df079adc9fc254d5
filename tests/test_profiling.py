"""Observability utilities (utils/profiling.py) — the tracing/profiling
subsystem the reference lacks entirely (SURVEY section 5)."""

import jax.numpy as jnp
import numpy as np

import cvxpylayers_tpu as ct
from cvxpylayers_tpu import CvxpyLayer
from cvxpylayers_tpu.utils.profiling import (
    PhaseTimer,
    problem_summary,
    trace_annotation,
)


def _layer():
    x = ct.Variable(3)
    v = ct.Parameter(3)
    prob = ct.Problem(
        ct.Minimize(ct.sum_squares(x - v)), [ct.sum(x) == 1, x >= 0]
    )
    return CvxpyLayer(prob, parameters=[v], variables=[x])


def test_phase_timer_accumulates():
    t = PhaseTimer()
    layer = _layer()
    vv = jnp.asarray(np.ones(3))
    with t.phase("solve"):
        (xs,) = layer(vv)
    with t.phase("solve", block_on=layer(vv)[0]):
        pass
    assert t.counts["solve"] == 2
    assert t.totals["solve"] > 0
    assert "solve:" in t.summary()


def test_trace_annotation_smoke():
    with trace_annotation("solve-region"):
        pass


def test_problem_summary_structure():
    layer = _layer()
    s = problem_summary(layer)
    assert s["n"] == 3 and s["dims"]["zero"] == 1
    assert s["dims"]["nonneg"] == 3
    assert s["nnz_A"] > 0
    assert s["gp"] is False
