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


@pytest.mark.parametrize("trial", range(4))
def test_random_socp_vs_slsqp(trial):
    # max mu'w s.t. ||F w|| <= s, sum w == 1, w >= 0  (Markowitz shape)
    n = int(rng.integers(4, 9))
    k = int(rng.integers(2, 5))
    mu = rng.standard_normal(n) * 0.2
    F = rng.standard_normal((k, n)) / np.sqrt(n)
    smax = 0.4
    w = ct.Variable(n, nonneg=True)
    mup = ct.Parameter(n)
    Fp = ct.Parameter((k, n))
    prob = ct.Problem(
        ct.Maximize(mup @ w),
        [ct.norm(Fp @ w, 2) <= smax, ct.sum(w) == 1],
    )
    layer = CvxpyLayer(prob, parameters=[mup, Fp], variables=[w])
    (ws,) = layer(jnp.asarray(mu), jnp.asarray(F))
    res = scipy.optimize.minimize(
        lambda z: -mu @ z, np.ones(n) / n, jac=lambda z: -mu,
        constraints=[
            {"type": "eq", "fun": lambda z: z.sum() - 1,
             "jac": lambda z: np.ones(n)},
            {"type": "ineq", "fun": lambda z: smax**2 - np.sum((F @ z)**2),
             "jac": lambda z: -2 * F.T @ (F @ z)},
        ],
        bounds=[(0, None)] * n, method="SLSQP",
        options={"ftol": 1e-14, "maxiter": 2000},
    )
    got = float(mu @ np.asarray(ws))
    assert got >= -res.fun - 1e-6, (got, -res.fun)
    assert np.linalg.norm(F @ np.asarray(ws)) <= smax + 1e-7


@pytest.mark.parametrize("trial", range(3))
def test_random_sdp_min_eig(trial):
    # min tr(CX), tr(X) = 1, X >> 0 -> smallest eigenvalue of C
    s = int(rng.integers(2, 5))
    C = rng.standard_normal((s, s))
    C = (C + C.T) / 2
    X = ct.Variable((s, s), symmetric=True)
    Cp = ct.Parameter((s, s))
    prob = ct.Problem(
        ct.Minimize(ct.trace(Cp @ X)), [ct.trace(X) == 1, ct.PSD(X)]
    )
    layer = CvxpyLayer(prob, parameters=[Cp], variables=[X])
    (Xs,) = layer(jnp.asarray(C))
    np.testing.assert_allclose(
        float(np.trace(C @ np.asarray(Xs))),
        np.linalg.eigvalsh(C)[0], atol=1e-6,
    )


@pytest.mark.parametrize("trial", range(4))
def test_random_perspective_quad(trial):
    """persp(||x - a||^2, s)(p, q) = q * ||p/q - a||^2 = ||p - q a||^2 / q
    for random a, p, q (the constant a is homogenized by s)."""
    rng = np.random.default_rng(100 + trial)
    n = int(rng.integers(2, 6))
    a = rng.standard_normal(n)
    x = ct.Variable(n)
    s = ct.Variable()
    p = ct.Parameter(n)
    q = ct.Parameter()
    t = ct.Variable()
    prob = ct.Problem(
        ct.Minimize(t),
        [t >= ct.perspective(ct.sum_squares(x - ct.Constant(a)), s),
         x == p, s == q],
    )
    layer = ct.CvxpyLayer(prob, parameters=[p, q], variables=[t])
    pv = rng.standard_normal(n)
    qv = float(rng.uniform(0.5, 3.0))
    (tv,) = layer(jnp.asarray(pv), jnp.asarray(qv))
    np.testing.assert_allclose(
        float(tv), np.sum((pv - qv * a) ** 2) / qv, atol=1e-6
    )


@pytest.mark.parametrize("trial", range(3))
def test_random_suppfunc_polytope(trial):
    """sigma of a random polytope {y : Gy <= h} (bounded: box plus
    random cuts) against a scipy linprog oracle."""
    from scipy.optimize import linprog

    rng = np.random.default_rng(200 + trial)
    n = int(rng.integers(2, 5))
    k = int(rng.integers(1, 4))
    G = rng.standard_normal((k, n))
    h = np.abs(rng.standard_normal(k)) + 0.5
    y = ct.Variable(n)
    f = ct.suppfunc(
        y, [ct.Constant(G) @ y <= ct.Constant(h), y <= 1, y >= -1]
    )
    x = ct.Variable(n)
    p = ct.Parameter(n)
    t = ct.Variable()
    prob = ct.Problem(ct.Minimize(t), [x == p, f(x) <= t])
    layer = ct.CvxpyLayer(prob, parameters=[p], variables=[t])
    pv = rng.standard_normal(n)
    (tv,) = layer(jnp.asarray(pv))
    res = linprog(-pv, A_ub=np.vstack([G, np.eye(n), -np.eye(n)]),
                  b_ub=np.concatenate([h, np.ones(2 * n)]),
                  bounds=[(None, None)] * n)
    assert res.status == 0
    np.testing.assert_allclose(float(tv), -res.fun, atol=1e-6)
