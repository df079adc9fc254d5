"""Round-2 atom additions: general pnorm(p), matrix_frac, sigma_max,
log_det — oracle-tested like the rest of the atom library (closed forms
and scipy references; cvxpylayers SURVEY section 4 test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.optimize

import cvxpylayers_tpu as ct
from cvxpylayers_tpu import CvxpyLayer

rng = np.random.default_rng(31)


class TestPnormGeneral:
    def test_p3_matches_scipy(self):
        n = 5
        x = ct.Variable(n)
        v = ct.Parameter(n)
        prob = ct.Problem(
            ct.Minimize(ct.pnorm(x - v, 3)), [ct.sum(x) == 1]
        )
        layer = CvxpyLayer(prob, parameters=[v], variables=[x])
        vv = rng.standard_normal(n)
        (xs,) = layer(jnp.asarray(vv))

        def obj(z):
            return np.sum(np.abs(z - vv) ** 3) ** (1 / 3)

        res = scipy.optimize.minimize(
            obj, np.ones(n) / n,
            constraints=[{"type": "eq",
                          "fun": lambda z: z.sum() - 1}],
            method="SLSQP", options={"ftol": 1e-14, "maxiter": 500},
        )
        assert obj(np.asarray(xs)) <= res.fun + 1e-6
        np.testing.assert_allclose(np.asarray(xs).sum(), 1.0, atol=1e-8)

    def test_p3_gradcheck_fd(self):
        n = 4
        x = ct.Variable(n)
        v = ct.Parameter(n)
        prob = ct.Problem(
            ct.Minimize(ct.pnorm(x - v, 3) + ct.sum_squares(x))
        )
        layer = CvxpyLayer(prob, parameters=[v], variables=[x])
        vv = jnp.asarray(rng.standard_normal(n))

        def loss(v_):
            return jnp.sum(layer(v_)[0] ** 2)

        g = jax.grad(loss)(vv)
        eps = 1e-5
        for i in range(n):
            e = jnp.zeros(n).at[i].set(eps)
            fd = (float(loss(vv + e)) - float(loss(vv - e))) / (2 * eps)
            np.testing.assert_allclose(float(g[i]), fd, atol=1e-4)

    def test_concave_half_norm(self):
        # max (sum sqrt(x_i))^2 over the simplex -> uniform, value n
        n = 4
        x = ct.Variable(n, nonneg=True)
        c = ct.Parameter(n)
        prob = ct.Problem(
            ct.Maximize(ct.pnorm(x, 0.5) + 0.0 * (c @ x)),
            [ct.sum(x) == 1],
        )
        layer = CvxpyLayer(prob, parameters=[c], variables=[x])
        (xs,) = layer(jnp.zeros(n))
        np.testing.assert_allclose(np.asarray(xs), np.full(n, 0.25),
                                   atol=1e-6)


class TestMatrixFrac:
    def test_closed_form(self):
        # min x'P^{-1}x s.t. a'x = 1  ->  x* = Pa/(a'Pa), val 1/(a'Pa)
        n = 4
        x = ct.Variable(n)
        a = ct.Parameter(n)
        L = rng.standard_normal((n, n))
        P = L @ L.T + np.eye(n)
        prob = ct.Problem(
            ct.Minimize(ct.matrix_frac(x, ct.Constant(P))),
            [a @ x == 1],
        )
        layer = CvxpyLayer(prob, parameters=[a], variables=[x])
        av = rng.standard_normal(n)
        (xs,) = layer(jnp.asarray(av))
        ref = P @ av / (av @ P @ av)
        np.testing.assert_allclose(np.asarray(xs), ref, atol=1e-6)

    def test_parametric_P(self):
        # P as a PSD parameter: DPP-legal since its entries enter the
        # PSD constraint block linearly
        n = 3
        x = ct.Variable(n)
        a = ct.Parameter(n)
        P = ct.Parameter((n, n), PSD=True)
        prob = ct.Problem(
            ct.Minimize(ct.matrix_frac(x, P)), [a @ x == 1]
        )
        layer = CvxpyLayer(prob, parameters=[a, P], variables=[x])
        av = rng.standard_normal(n)
        L = rng.standard_normal((n, n))
        Pv = L @ L.T + np.eye(n)
        (xs,) = layer(jnp.asarray(av), jnp.asarray(Pv))
        ref = Pv @ av / (av @ Pv @ av)
        np.testing.assert_allclose(np.asarray(xs), ref, atol=1e-6)


class TestSigmaMax:
    def test_spectral_centering(self):
        # min_t sigma_max(A - t I) for symmetric A -> (lmax - lmin)/2
        s = 3
        t = ct.Variable(())
        A = ct.Parameter((s, s))
        expr = A - t * ct.Constant(np.eye(s))
        prob = ct.Problem(ct.Minimize(ct.sigma_max(expr)))
        layer = CvxpyLayer(prob, parameters=[A], variables=[t])
        Av = rng.standard_normal((s, s))
        Av = (Av + Av.T) / 2
        (ts,) = layer(jnp.asarray(Av))
        w = np.linalg.eigvalsh(Av)
        np.testing.assert_allclose(
            float(ts), (w[-1] + w[0]) / 2, atol=1e-6
        )


class TestLogDet:
    def test_inverse_recovery(self):
        # max log det X - tr(S X)  ->  X* = S^{-1}
        s = 3
        X = ct.Variable((s, s), symmetric=True)
        S = ct.Parameter((s, s))
        prob = ct.Problem(
            ct.Maximize(ct.log_det(X) - ct.trace(S @ X))
        )
        layer = CvxpyLayer(prob, parameters=[S], variables=[X])
        L = rng.standard_normal((s, s))
        Sv = L @ L.T + np.eye(s)
        (Xs,) = layer(jnp.asarray(Sv))
        np.testing.assert_allclose(
            np.asarray(Xs), np.linalg.inv(Sv), atol=1e-6
        )

    def test_gradcheck_fd(self):
        s = 2
        X = ct.Variable((s, s), symmetric=True)
        S = ct.Parameter((s, s))
        prob = ct.Problem(
            ct.Maximize(ct.log_det(X) - ct.trace(S @ X))
        )
        layer = CvxpyLayer(prob, parameters=[S], variables=[X])
        L = rng.standard_normal((s, s))
        Sv = jnp.asarray(L @ L.T + np.eye(s))

        def loss(S_):
            return jnp.sum(layer(S_)[0] ** 2)

        g = jax.grad(loss)(Sv)
        eps = 1e-5
        for i in range(s):
            for j in range(s):
                e = jnp.zeros((s, s)).at[i, j].set(eps)
                fd = (float(loss(Sv + e)) - float(loss(Sv - e))) / (2 * eps)
                np.testing.assert_allclose(float(g[i, j]), fd, atol=1e-3)


class TestBmatCumsum:
    def test_bmat_values(self):
        # lambda_max of a bmat must match numpy block assembly
        a = ct.Parameter((2, 2))
        expr = ct.bmat([[a, ct.Constant(np.zeros((2, 2)))],
                        [ct.Constant(np.zeros((2, 2))), 2.0 * a]])
        t = ct.Variable(())
        prob = ct.Problem(ct.Minimize(t), [ct.lambda_max(expr) <= t])
        layer = CvxpyLayer(prob, parameters=[a], variables=[t])
        av = rng.standard_normal((2, 2))
        av = (av + av.T) / 2
        (ts,) = layer(jnp.asarray(av))
        M = np.block([[av, np.zeros((2, 2))], [np.zeros((2, 2)), 2 * av]])
        np.testing.assert_allclose(
            float(ts), np.linalg.eigvalsh(M)[-1], atol=1e-6
        )

    def test_cumsum_1d(self):
        n = 5
        v = ct.Parameter(n)
        x = ct.Variable(n)
        prob = ct.Problem(ct.Minimize(ct.sum_squares(x - ct.cumsum(v))))
        layer = CvxpyLayer(prob, parameters=[v], variables=[x])
        vv = rng.standard_normal(n)
        (xs,) = layer(jnp.asarray(vv))
        np.testing.assert_allclose(np.asarray(xs), np.cumsum(vv),
                                   atol=1e-7)

    def test_cumsum_2d_axes(self):
        m, n = 3, 4
        v = ct.Parameter((m, n))
        vv = rng.standard_normal((m, n))
        for axis in (0, 1):
            x = ct.Variable((m, n))
            prob = ct.Problem(
                ct.Minimize(ct.sum_squares(x - ct.cumsum(v, axis=axis)))
            )
            layer = CvxpyLayer(prob, parameters=[v], variables=[x])
            (xs,) = layer(jnp.asarray(vv))
            np.testing.assert_allclose(
                np.asarray(xs), np.cumsum(vv, axis=axis), atol=1e-7
            )


class TestNDExpressions:
    """N-D (>2) leaves: elementwise atoms, sum, reshape, indexing,
    batching, and gradients all canonicalize over flattened reps
    (round-1 gap; matrix-structured atoms still validate 2-D)."""

    def test_3d_projection(self):
        x = ct.Variable((2, 3, 4))
        v = ct.Parameter((2, 3, 4))
        prob = ct.Problem(ct.Minimize(ct.sum_squares(x - v)), [x >= 0])
        layer = CvxpyLayer(prob, parameters=[v], variables=[x])
        vv = rng.standard_normal((2, 3, 4))
        (xs,) = layer(jnp.asarray(vv))
        assert xs.shape == (2, 3, 4)
        np.testing.assert_allclose(
            np.asarray(xs), np.maximum(vv, 0), atol=1e-7
        )

    def test_3d_index_reshape_batch_grad(self):
        y = ct.Variable((2, 2, 2))
        w = ct.Parameter((2, 2, 2))
        prob = ct.Problem(
            ct.Minimize(ct.sum_squares(
                ct.reshape(y, (8,)) - ct.reshape(w, (8,))
            )),
            [y[0] >= 0],
        )
        layer = CvxpyLayer(prob, parameters=[w], variables=[y])
        wv = rng.standard_normal((2, 2, 2))
        (ys,) = layer(jnp.asarray(wv))
        ref = wv.copy()
        ref[0] = np.maximum(ref[0], 0)
        np.testing.assert_allclose(np.asarray(ys), ref, atol=1e-7)
        # batched N-D params -> batched N-D outputs
        (ysb,) = layer(jnp.asarray(np.stack([wv, wv + 1.0])))
        assert ysb.shape == (2, 2, 2, 2)
        g = jax.grad(lambda w_: jnp.sum(layer(w_)[0] ** 2))(
            jnp.asarray(wv)
        )
        assert np.isfinite(np.asarray(g)).all()

    def test_matrix_atoms_still_require_2d(self):
        x3 = ct.Variable((2, 2, 2))
        import pytest as _pytest

        with _pytest.raises(Exception):
            ct.trace(x3)
        with _pytest.raises(Exception):
            ct.lambda_max(x3)


class TestConvKron:
    def test_conv_matches_numpy(self):
        n = 6
        c = np.array([1.0, -2.0, 0.5])
        v = ct.Parameter(n)
        x = ct.Variable(n + c.size - 1)
        prob = ct.Problem(ct.Minimize(ct.sum_squares(x - ct.conv(c, v))))
        layer = CvxpyLayer(prob, parameters=[v], variables=[x])
        vv = rng.standard_normal(n)
        (xs,) = layer(jnp.asarray(vv))
        np.testing.assert_allclose(np.asarray(xs), np.convolve(c, vv),
                                   atol=1e-8)

    def test_kron_matches_numpy(self):
        C = np.array([[1.0, 2.0], [0.0, -1.0]])
        X = ct.Variable((2, 2))
        W = ct.Parameter((2, 2))
        prob = ct.Problem(
            ct.Minimize(ct.sum_squares(ct.reshape(
                ct.kron(C, X) - ct.kron(C, W), (16,)
            )))
        )
        layer = CvxpyLayer(prob, parameters=[W], variables=[X])
        Wv = rng.standard_normal((2, 2))
        (Xs,) = layer(jnp.asarray(Wv))
        np.testing.assert_allclose(np.asarray(Xs), Wv, atol=1e-6)
