"""Randomized conformance fuzz: random problems through the full pipeline
(DSL -> canon -> solve -> recover) vs independent scipy solutions."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize

import cvxpylayers_tpu as ct
from cvxpylayers_tpu import CvxpyLayer

rng = np.random.default_rng(99)


@pytest.mark.parametrize("trial", range(8))
def test_random_lp(trial):
    n = int(rng.integers(2, 8))
    m = int(rng.integers(n, 2 * n + 4))
    G = rng.standard_normal((m, n))
    x_f = rng.standard_normal(n)
    h = G @ x_f + np.abs(rng.standard_normal(m)) + 0.2
    c = rng.standard_normal(n)
    bound = 8.0

    x = ct.Variable(n)
    cp_ = ct.Parameter(n)
    prob = ct.Problem(
        ct.Minimize(cp_ @ x),
        [ct.Constant(G) @ x <= ct.Constant(h),
         x <= bound, x >= -bound],
    )
    layer = CvxpyLayer(prob, parameters=[cp_], variables=[x])
    (xs,) = layer(jnp.asarray(c))
    ref = scipy.optimize.linprog(
        c,
        A_ub=np.vstack([G, np.eye(n), -np.eye(n)]),
        b_ub=np.concatenate([h, bound * np.ones(n), bound * np.ones(n)]),
        bounds=(None, None), method="highs",
    )
    assert ref.status == 0
    np.testing.assert_allclose(
        float(c @ np.asarray(xs)), ref.fun, atol=1e-6, rtol=1e-7
    )


@pytest.mark.parametrize("trial", range(8))
def test_random_qp(trial):
    n = int(rng.integers(2, 10))
    mi = int(rng.integers(1, n + 3))
    v = rng.standard_normal(n) * 2
    G = rng.standard_normal((mi, n))
    h = G @ np.clip(v, -0.5, 0.5) + np.abs(rng.standard_normal(mi)) + 0.1

    x = ct.Variable(n)
    vp = ct.Parameter(n)
    prob = ct.Problem(
        ct.Minimize(ct.sum_squares(x - vp)),
        [ct.Constant(G) @ x <= ct.Constant(h)],
    )
    layer = CvxpyLayer(prob, parameters=[vp], variables=[x])
    (xs,) = layer(jnp.asarray(v))
    res = scipy.optimize.minimize(
        lambda z: 0.5 * np.sum((z - v) ** 2),
        np.zeros(n), jac=lambda z: z - v,
        constraints=[{"type": "ineq", "fun": lambda z: h - G @ z,
                      "jac": lambda z: -G}],
        method="SLSQP", options={"ftol": 1e-14, "maxiter": 500},
    )
    np.testing.assert_allclose(np.asarray(xs), res.x, atol=2e-5)


@pytest.mark.parametrize("trial", range(4))
def test_random_ipm_matches_admm(trial):
    n = int(rng.integers(3, 8))
    v = rng.standard_normal(n)
    x = ct.Variable(n)
    vp = ct.Parameter(n)
    prob = ct.Problem(
        ct.Minimize(ct.sum_squares(x - vp)),
        [ct.sum(x) == 1, x >= 0, ct.norm(x, 2) <= 0.9],
    )
    layer = CvxpyLayer(prob, parameters=[vp], variables=[x])
    (xa,) = layer(jnp.asarray(v))
    (xi,) = layer(jnp.asarray(v), solver_args={"solve_method": "ipm"})
    np.testing.assert_allclose(np.asarray(xa), np.asarray(xi), atol=1e-6)


@pytest.mark.parametrize("trial", range(4))
def test_random_entropy_projection(trial):
    # max c'x + sum entr(x), sum x == 1, x >= 0  ->  x = softmax(c)
    n = int(rng.integers(3, 9))
    c = rng.standard_normal(n) * 1.5
    x = ct.Variable(n, nonneg=True)
    cp_ = ct.Parameter(n)
    prob = ct.Problem(
        ct.Maximize(cp_ @ x + ct.sum(ct.entr(x))), [ct.sum(x) == 1]
    )
    layer = CvxpyLayer(prob, parameters=[cp_], variables=[x])
    (xs,) = layer(jnp.asarray(c))
    want = np.exp(c - c.max())
    want = want / want.sum()
    np.testing.assert_allclose(np.asarray(xs), want, atol=1e-6)


def test_logistic_layer_gradients_fd():
    import jax

    from cvxpylayers_tpu import models

    nf, ns = 2, 6
    layer = models.logistic_regression_layer(nf, ns, reg=0.3)
    Xy = jnp.asarray(rng.standard_normal((ns, nf)))

    def f(Xy_):
        (beta,) = layer(Xy_)
        return jnp.sum(beta**2)

    g = jax.grad(f)(Xy)
    eps = 1e-6
    for _ in range(3):
        D = rng.standard_normal((ns, nf))
        num = (float(f(Xy + eps * D)) - float(f(Xy - eps * D))) / (2 * eps)
        ana = float(jnp.sum(g * D))
        assert abs(ana - num) < 2e-4 * (1 + abs(num)), (ana, num)
