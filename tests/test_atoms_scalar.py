"""Round-2 scalar/elementwise atom batch: log1p, xexp, scalene, std/var/
mean, cummax, axis-aware max/min, tr_inv, and the approximation atoms
log_normcdf / loggamma — oracle-tested against numpy/scipy closed forms
like the rest of the atom library (cvxpylayers SURVEY section 4 test
strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import gammaln
from scipy.stats import norm as spnorm

import cvxpylayers_tpu as ct
from cvxpylayers_tpu import CvxpyLayer

rng = np.random.default_rng(7)


def pinned_value(f, p_val, shape=None):
    """min t s.t. x == p, f(x) <= t — evaluates a convex expression at a
    pinned point through the full canon+solve pipeline."""
    shape = shape if shape is not None else np.shape(p_val)
    x = ct.Variable(shape)
    p = ct.Parameter(shape)
    t = ct.Variable()
    prob = ct.Problem(ct.Minimize(t), [x == p, f(x) <= t])
    layer = CvxpyLayer(prob, parameters=[p], variables=[x, t])
    _, ts = layer(jnp.asarray(p_val))
    return float(ts)


class TestCompositions:
    def test_log1p(self):
        pv = np.array([0.5, 1.0, 2.0])
        got = pinned_value(lambda x: -ct.sum(ct.log1p(x)), pv)
        np.testing.assert_allclose(got, -np.sum(np.log1p(pv)), atol=1e-6)

    def test_scalene(self):
        pv = np.array([-1.0, 2.0, -3.0, 4.0])
        got = pinned_value(lambda x: ct.sum(ct.scalene(x, 2.0, 0.5)), pv)
        want = np.sum(2.0 * np.maximum(pv, 0) + 0.5 * np.maximum(-pv, 0))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_std_var_mean(self):
        pv = rng.standard_normal(6)
        np.testing.assert_allclose(
            pinned_value(lambda x: ct.std(x), pv), np.std(pv), atol=1e-6
        )
        np.testing.assert_allclose(
            pinned_value(lambda x: ct.std(x, ddof=1), pv),
            np.std(pv, ddof=1), atol=1e-6,
        )
        np.testing.assert_allclose(
            pinned_value(lambda x: ct.var(x, ddof=1), pv),
            np.var(pv, ddof=1), atol=1e-6,
        )
        # mean is affine: both directions
        np.testing.assert_allclose(
            pinned_value(lambda x: ct.mean(x), pv), np.mean(pv), atol=1e-6
        )

    def test_std_matrix_input(self):
        pv = rng.standard_normal((3, 4))
        got = pinned_value(lambda x: ct.std(x), pv)
        np.testing.assert_allclose(got, np.std(pv), atol=1e-6)


class TestXExp:
    def test_pinned(self):
        pv = np.array([0.2, 1.0, 2.5])
        got = pinned_value(lambda x: ct.sum(ct.xexp(x)), pv)
        np.testing.assert_allclose(got, np.sum(pv * np.exp(pv)), atol=1e-5)

    def test_unconstrained_optimum(self):
        # min xexp(x) - c x  =>  (x+1) e^x = c
        c = ct.Parameter()
        x = ct.Variable()
        prob = ct.Problem(ct.Minimize(ct.xexp(x) - ct.multiply(c, x)))
        layer = CvxpyLayer(prob, parameters=[c], variables=[x])
        cv = 7.0
        (xs,) = layer(jnp.asarray(cv))
        xv = float(xs)
        np.testing.assert_allclose((xv + 1) * np.exp(xv), cv, rtol=1e-5)

    def test_gradcheck_fd(self):
        c = ct.Parameter()
        x = ct.Variable()
        prob = ct.Problem(ct.Minimize(ct.xexp(x) - ct.multiply(c, x)))
        layer = CvxpyLayer(prob, parameters=[c], variables=[x])

        def loss(cv):
            return layer(cv)[0]

        cv = jnp.asarray(5.0)
        g = jax.grad(loss)(cv)
        eps = 1e-5
        fd = (float(loss(cv + eps)) - float(loss(cv - eps))) / (2 * eps)
        np.testing.assert_allclose(float(g), fd, rtol=1e-3, atol=1e-6)


class TestCumMaxAndAxis:
    def test_cummax_vector(self):
        pv = np.array([1.0, 3.0, 2.0, 5.0, 4.0])
        got = pinned_value(lambda x: ct.sum(ct.cummax(x)), pv)
        np.testing.assert_allclose(
            got, np.sum(np.maximum.accumulate(pv)), atol=1e-6
        )

    def test_cummax_matrix_axis1(self):
        pv = rng.standard_normal((3, 4))
        got = pinned_value(lambda x: ct.sum(ct.cummax(x, axis=1)), pv)
        np.testing.assert_allclose(
            got, np.sum(np.maximum.accumulate(pv, axis=1)), atol=1e-6
        )

    def test_max_min_axis(self):
        pv = rng.standard_normal((3, 4))
        got = pinned_value(
            lambda x: ct.sum(ct.max(x, axis=0)) - ct.sum(ct.min(x, axis=1)),
            pv,
        )
        want = pv.max(axis=0).sum() - pv.min(axis=1).sum()
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestTrInv:
    def test_pinned(self):
        n = 3
        A = rng.standard_normal((n, n))
        P = A @ A.T + n * np.eye(n)
        X = ct.Variable((n, n))
        pp = ct.Parameter((n, n))
        t = ct.Variable()
        prob = ct.Problem(ct.Minimize(t), [X == pp, ct.tr_inv(X) <= t])
        layer = CvxpyLayer(prob, parameters=[pp], variables=[X, t])
        _, ts = layer(jnp.asarray(P))
        np.testing.assert_allclose(
            float(ts), np.trace(np.linalg.inv(P)), atol=1e-5
        )


class TestApprox:
    def test_log_normcdf_accuracy(self):
        pv = np.array([-2.0, 0.0, 1.5])
        got = pinned_value(lambda x: -ct.sum(ct.log_normcdf(x)), pv)
        # approximation contract: <= 2.5e-4 per element on [-6, 6]
        np.testing.assert_allclose(
            got, -np.sum(spnorm.logcdf(pv)), atol=1e-3
        )

    def test_probit_layer_grad(self):
        # max sum log_normcdf(a*x + b) - x^2: concave; FD gradcheck
        a = ct.Parameter(3)
        x = ct.Variable()
        av = jnp.asarray([0.5, -1.0, 2.0])
        prob = ct.Problem(
            ct.Maximize(ct.sum(ct.log_normcdf(ct.multiply(a, x)))
                        - ct.square(x))
        )
        layer = CvxpyLayer(prob, parameters=[a], variables=[x])

        def loss(aa):
            return layer(aa)[0]

        g = jax.grad(loss)(av)
        eps = 1e-4
        for i in range(3):
            e = jnp.zeros(3).at[i].set(eps)
            fd = (float(loss(av + e)) - float(loss(av - e))) / (2 * eps)
            np.testing.assert_allclose(float(g[i]), fd, atol=2e-3)

    def test_loggamma_accuracy(self):
        pv = np.array([0.3, 1.0, 2.5, 7.0])
        got = pinned_value(lambda x: ct.sum(ct.loggamma(x)), pv)
        np.testing.assert_allclose(got, np.sum(gammaln(pv)), atol=1e-3)


class TestBatch2:
    def test_power_negative(self):
        pv = np.array([0.5, 1.5, 3.0])
        got = pinned_value(lambda x: ct.sum(ct.power(x, -2)), pv)
        np.testing.assert_allclose(got, np.sum(pv ** -2.0), atol=1e-5)
        got = pinned_value(lambda x: ct.sum(ct.power(x, -0.5)), pv)
        np.testing.assert_allclose(got, np.sum(pv ** -0.5), atol=1e-5)

    def test_inv_prod(self):
        pv = np.array([0.5, 1.5, 3.0])
        got = pinned_value(lambda x: ct.inv_prod(x), pv)
        np.testing.assert_allclose(got, 1.0 / np.prod(pv), atol=1e-6)

    def test_log_sum_exp_axis(self):
        from scipy.special import logsumexp

        pv = rng.standard_normal((3, 4))
        got = pinned_value(
            lambda x: ct.sum(ct.log_sum_exp(x, axis=1)), pv
        )
        np.testing.assert_allclose(
            got, np.sum(logsumexp(pv, axis=1)), atol=1e-6
        )

    def test_norm_axis(self):
        pv = rng.standard_normal((3, 4))
        got = pinned_value(lambda x: ct.sum(ct.norm(x, 2, axis=1)), pv)
        np.testing.assert_allclose(
            got, np.sum(np.linalg.norm(pv, axis=1)), atol=1e-6
        )
        got = pinned_value(
            lambda x: ct.sum(ct.norm(x, 1, axis=0))
            + ct.sum(ct.norm(x, np.inf, axis=1)),
            pv,
        )
        want = np.abs(pv).sum(0).sum() + np.abs(pv).max(1).sum()
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_vec_to_upper_tri(self):
        v6 = rng.standard_normal(6)
        M = ct.vec_to_upper_tri(ct.Constant(v6)).value
        want = np.zeros((3, 3))
        want[np.triu_indices(3)] = v6
        np.testing.assert_allclose(M, want)
        v3 = rng.standard_normal(3)
        M = ct.vec_to_upper_tri(ct.Constant(v3), strict=True).value
        want = np.zeros((3, 3))
        want[np.triu_indices(3, k=1)] = v3
        np.testing.assert_allclose(M, want)

    def test_gp_sum_axis(self):
        X = ct.Variable((2, 3), pos=True)
        P = ct.Parameter((2, 3), pos=True)
        prob = ct.Problem(
            ct.Minimize(ct.max(ct.sum(X, axis=1))), [X >= P]
        )
        layer = CvxpyLayer(prob, parameters=[P], variables=[X], gp=True)
        Pv = np.abs(rng.standard_normal((2, 3))) + 0.2
        (Xs,) = layer(jnp.asarray(Pv))
        Xs = np.asarray(Xs)
        assert np.all(Xs >= Pv - 1e-6)
        np.testing.assert_allclose(
            Xs.sum(axis=1).max(), Pv.sum(axis=1).max(), rtol=1e-5
        )


class TestPerspective:
    """persp(f, s) = s*f(x/s) via windowed-homogenization canon
    (quad_over_lin / entropy / affine oracles; cf. cvxpy perspective)."""

    def test_quad_over_lin_oracle(self):
        x = ct.Variable(3)
        s = ct.Variable()
        p = ct.Parameter(3)
        q = ct.Parameter()
        t = ct.Variable()
        prob = ct.Problem(
            ct.Minimize(t),
            [t >= ct.perspective(ct.sum_squares(x), s), x == p, s == q],
        )
        layer = CvxpyLayer(prob, parameters=[p, q], variables=[t])
        pv = jnp.array([1.0, -2.0, 0.5])
        qv = jnp.array(2.0)
        (tv,) = layer(pv, qv)
        np.testing.assert_allclose(
            float(tv), float(np.sum(np.array(pv) ** 2) / qv), atol=1e-6
        )
        g = jax.grad(lambda a, b: layer(a, b)[0], argnums=(0, 1))(pv, qv)
        np.testing.assert_allclose(
            np.asarray(g[0]), 2 * np.array(pv) / float(qv), atol=1e-5
        )
        np.testing.assert_allclose(
            float(g[1]), -np.sum(np.array(pv) ** 2) / float(qv) ** 2,
            atol=1e-5,
        )

    def test_free_scale(self):
        # min ||p||^2/s + s -> s* = ||p||
        x = ct.Variable(3)
        s = ct.Variable()
        p = ct.Parameter(3)
        prob = ct.Problem(
            ct.Minimize(ct.perspective(ct.sum_squares(x), s) + s), [x == p]
        )
        layer = CvxpyLayer(prob, parameters=[p], variables=[x, s])
        pv = jnp.array([1.0, -2.0, 0.5])
        _, ss = layer(pv)
        np.testing.assert_allclose(
            float(ss), np.sqrt(np.sum(np.array(pv) ** 2)), atol=1e-5
        )

    def test_concave_entropy(self):
        # max t s.t. t <= s*sum(entr(x/s)) = -sum x log(x/s), x=p, s=1.5
        xe = ct.Variable(3, pos=True)
        se = ct.Variable()
        pe = ct.Parameter(3)
        te = ct.Variable()
        prob = ct.Problem(
            ct.Maximize(te),
            [
                te <= ct.perspective(ct.sum(ct.entr(xe)), se),
                xe == pe,
                se == 1.5,
            ],
        )
        layer = CvxpyLayer(prob, parameters=[pe], variables=[te])
        pv = np.array([0.2, 0.5, 0.8])
        (tv,) = layer(jnp.asarray(pv))
        np.testing.assert_allclose(
            float(tv), -np.sum(pv * np.log(pv / 1.5)), atol=1e-6
        )

    def test_affine_f(self):
        # persp(sum(x)+3, s) == sum(x) + 3 s exactly
        xa = ct.Variable(2)
        sa = ct.Variable()
        pa = ct.Parameter(2)
        prob = ct.Problem(
            ct.Minimize(ct.sum_squares(xa - pa) + ct.square(sa - 2.0)),
            [ct.perspective(ct.sum(xa) + 3.0, sa) == ct.sum(pa) + 6.0],
        )
        layer = CvxpyLayer(prob, parameters=[pa], variables=[xa, sa])
        pv = jnp.array([0.7, -0.3])
        xs, ss = layer(pv)
        np.testing.assert_allclose(np.asarray(xs), np.asarray(pv), atol=1e-5)
        np.testing.assert_allclose(float(ss), 2.0, atol=1e-5)

    def test_shared_subexpression(self):
        # f's subtree also used outside the perspective: the sandbox cache
        # must give the perspective its own homogenized copy.
        x = ct.Variable(2)
        s = ct.Variable()
        p = ct.Parameter(2)
        f = ct.sum_squares(x)
        prob = ct.Problem(
            ct.Minimize(ct.perspective(f, s) + f + s),
            [x == p],
        )
        layer = CvxpyLayer(prob, parameters=[p], variables=[x, s])
        pv = jnp.array([0.6, -1.1])
        _, ss = layer(pv)
        np.testing.assert_allclose(
            float(ss), np.sqrt(np.sum(np.array(pv) ** 2)), atol=1e-5
        )

    def test_dcp_rejection(self):
        x = ct.Variable()
        s = ct.Variable()
        bad = ct.perspective(ct.sum_squares(x), ct.square(s))
        assert bad.curvature() is ct.expressions.expression.Curvature.UNKNOWN


class TestWeightedGeoMean:
    def test_weighted(self):
        x = ct.Variable(4)
        p = ct.Parameter(4)
        t = ct.Variable()
        w = [1.0, 2.0, 0.0, 3.5]
        prob = ct.Problem(
            ct.Maximize(t), [t <= ct.geo_mean(x, w), x == p]
        )
        layer = CvxpyLayer(prob, parameters=[p], variables=[t])
        pv = np.array([0.5, 1.2, 9.9, 2.0])
        (tv,) = layer(jnp.asarray(pv))
        wn = np.array(w) / np.sum(w)
        want = np.prod(pv ** wn)
        np.testing.assert_allclose(float(tv), want, atol=1e-6)
        g = jax.grad(lambda q: layer(q)[0])(jnp.asarray(pv))
        np.testing.assert_allclose(np.asarray(g), want * wn / pv, atol=1e-5)

    def test_single_weight(self):
        x = ct.Variable(4)
        p = ct.Parameter(4)
        t = ct.Variable()
        prob = ct.Problem(
            ct.Maximize(t), [t <= ct.geo_mean(x, [0, 0, 1, 0]), x == p]
        )
        layer = CvxpyLayer(prob, parameters=[p], variables=[t])
        pv = np.array([0.5, 1.2, 9.9, 2.0])
        (tv,) = layer(jnp.asarray(pv))
        np.testing.assert_allclose(float(tv), pv[2], atol=1e-6)

    def test_bad_weights(self):
        x = ct.Variable(3)
        import pytest

        with pytest.raises(ValueError):
            ct.geo_mean(x, [1.0, -1.0, 1.0])
        with pytest.raises(ValueError):
            ct.geo_mean(x, [1.0, 1.0])
