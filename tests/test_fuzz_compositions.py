"""Compositional canon fuzz: random convex expression trees are solved
through the full pipeline and cross-checked against scipy SLSQP, with
the (independently oracle-tested) `expr.value` evaluator supplying the
objective. Exercises atom GRAPHS in combination — the canon bugs unit
tests miss are exactly interactions between epigraph constructions."""

import numpy as np
import pytest
import scipy.optimize

import cvxpylayers_tpu as ct

N = 4


def _affine(rng, x):
    a = rng.standard_normal(N)
    b = float(rng.standard_normal())
    return ct.Constant(a) @ x + b, lambda z, a=a, b=b: a @ z + b


def _affine_vec(rng, x, m=3):
    A = rng.standard_normal((m, N))
    b = rng.standard_normal(m)
    return ct.Constant(A) @ x + ct.Constant(b), None


_LEAVES = [
    lambda rng, x: ct.abs(_affine(rng, x)[0]),
    lambda rng, x: ct.square(_affine(rng, x)[0]),
    lambda rng, x: ct.exp(0.5 * _affine(rng, x)[0]),
    lambda rng, x: ct.logistic(_affine(rng, x)[0]),
    lambda rng, x: ct.huber(_affine(rng, x)[0], 0.7),
    lambda rng, x: ct.pos(_affine(rng, x)[0]),
    lambda rng, x: ct.norm(_affine_vec(rng, x)[0], 2),
    lambda rng, x: ct.norm(_affine_vec(rng, x)[0], 1),
    lambda rng, x: ct.norm(_affine_vec(rng, x)[0], np.inf),
    lambda rng, x: ct.log_sum_exp(0.5 * _affine_vec(rng, x)[0]),
    lambda rng, x: ct.sum_squares(_affine_vec(rng, x)[0]),
    lambda rng, x: ct.pnorm(_affine_vec(rng, x)[0], 3),
    lambda rng, x: ct.quad_over_lin(_affine_vec(rng, x)[0],
                                    ct.Constant(2.0)),
    lambda rng, x: ct.max(_affine_vec(rng, x)[0]),
    lambda rng, x: ct.sum_largest(_affine_vec(rng, x)[0], 2),
    lambda rng, x: ct.tv(_affine_vec(rng, x)[0]),
]


def _random_convex(rng, x, k=3):
    terms = [rng.choice(_LEAVES)(rng, x) for _ in range(k)]
    mode = rng.integers(3)
    if mode == 0:
        out = terms[0]
        for t in terms[1:]:
            out = out + float(rng.uniform(0.1, 2.0)) * t
        return out
    if mode == 1:
        out = ct.maximum(terms[0], terms[1])
        for t in terms[2:]:
            out = ct.maximum(out, t)
        return out
    return terms[0] + ct.maximum(terms[1], terms[2])


@pytest.mark.parametrize("trial", range(12))
def test_random_composition_vs_slsqp(trial):
    rng = np.random.default_rng(1000 + trial)
    x = ct.Variable(N)
    obj = _random_convex(rng, x)
    assert obj.is_convex()
    prob = ct.Problem(ct.Minimize(obj), [x >= -2, x <= 2])
    val = prob.solve()
    assert prob.status == "optimal"

    def f(z):
        x.value = z
        return float(obj.value)

    best = np.inf
    for s in range(4):
        z0 = rng.uniform(-2, 2, N) if s else np.zeros(N)
        res = scipy.optimize.minimize(
            f, z0, bounds=[(-2, 2)] * N, method="SLSQP",
            options={"maxiter": 400, "ftol": 1e-12},
        )
        best = min(best, res.fun)
    # our global conic solution must be at least as good as SLSQP's
    # best local solution, and SLSQP started AT our solution must not
    # improve on it
    assert val <= best + 1e-5 * (1 + abs(best)), (val, best)
    x_ours = np.asarray(prob.variables()[0].value
                        if hasattr(prob, "variables") else x.value)
    res2 = scipy.optimize.minimize(
        f, np.clip(x_ours, -2, 2), bounds=[(-2, 2)] * N, method="SLSQP",
        options={"maxiter": 400, "ftol": 1e-12},
    )
    assert res2.fun >= val - 1e-5 * (1 + abs(val)), (res2.fun, val)


def _pos_vec(rng, x, m=3):
    # affine expression kept strictly positive on the box [-2, 2]^N
    A = rng.standard_normal((m, N)) * 0.3
    b = np.abs(A).sum(1) * 2.2 + 0.5
    return ct.Constant(A) @ x + ct.Constant(b)


_CONCAVE = [
    lambda rng, x: ct.log(_pos_vec(rng, x, 1)),
    lambda rng, x: ct.sqrt(_pos_vec(rng, x, 1)),
    lambda rng, x: ct.sum(ct.entr(0.2 * _pos_vec(rng, x, 2))),
    lambda rng, x: ct.geo_mean(_pos_vec(rng, x, 2)),
    lambda rng, x: ct.harmonic_mean(_pos_vec(rng, x, 2)),
    lambda rng, x: ct.min(_pos_vec(rng, x, 3)),
    lambda rng, x: ct.pnorm(_pos_vec(rng, x, 2), 0.5),
]


@pytest.mark.parametrize("trial", range(6))
def test_random_concave_maximize_vs_slsqp(trial):
    # the maximize mirror: random positive-weighted sums of concave
    # atom graphs over positive affine arguments (a 60-trial offline
    # soak of this generator passed 0-issues; these seeds pin a sample)
    rng = np.random.default_rng(50001 + 2 * trial)  # odd seeds of the soak
    x = ct.Variable(N)
    terms = [_CONCAVE[rng.integers(len(_CONCAVE))](rng, x)
             for _ in range(3)]
    w = rng.uniform(0.2, 1.5, 3)
    obj = w[0] * terms[0] + w[1] * terms[1] + w[2] * terms[2]
    obj = ct.sum(obj) if not obj.is_scalar() else obj
    assert obj.is_concave()
    prob = ct.Problem(ct.Maximize(obj), [x >= -2, x <= 2])
    val = prob.solve()
    assert prob.status == "optimal"

    def negf(z):
        x.value = z
        return -float(np.sum(obj.value))

    best = np.inf
    for s in range(3):
        z0 = rng.uniform(-2, 2, N) if s else np.zeros(N)
        res = scipy.optimize.minimize(
            negf, z0, bounds=[(-2, 2)] * N, method="SLSQP",
            options={"maxiter": 400, "ftol": 1e-12},
        )
        best = min(best, res.fun)
    assert -val <= best + 1e-4 * (1 + abs(best)), (val, -best)
