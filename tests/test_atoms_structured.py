"""Structured atoms (sum_largest, dotsort, norm_nuc, lambda_sum_largest,
harmonic_mean, tv, mixed_norm, matrix norms) and the new affine maps
(vec, upper_tri, diff, outer, partial_trace, partial_transpose), each
checked against a numpy oracle via the epigraph-equality pattern:
min/max t s.t. t >=/<= atom(x), x == v  =>  t* = atom(v).

Reference parity: cvxpy's atom library (the reference reaches these
through cvxpy; see cvxpylayers docs/guide), atom semantics matched to
cvxpy.sum_largest/dotsort/normNuc/lambda_sum_largest/harmonic_mean/tv/
mixed_norm/vec/upper_tri/diff/partial_trace/partial_transpose.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import cvxpylayers_tpu as ct
from cvxpylayers_tpu import CvxpyLayer

rng = np.random.default_rng(7)


def epi_value(atom_fn, v_shape, vv, maximize=False):
    v = ct.Parameter(v_shape)
    x = ct.Variable(v_shape)
    t = ct.Variable()
    if maximize:
        prob = ct.Problem(ct.Maximize(t), [x == v, t <= atom_fn(x)])
    else:
        prob = ct.Problem(ct.Minimize(t), [x == v, t >= atom_fn(x)])
    layer = CvxpyLayer(prob, parameters=[v], variables=[t])
    (ts,) = layer(jnp.asarray(vv))
    return float(ts)


def affine_value(atom_fn, v_shape, vv, out_shape):
    v = ct.Parameter(v_shape)
    y = ct.Variable(out_shape)
    prob = ct.Problem(ct.Minimize(ct.sum_squares(
        ct.reshape(y - atom_fn(v), (int(np.prod(out_shape)),)))))
    layer = CvxpyLayer(prob, parameters=[v], variables=[y])
    (ys,) = layer(jnp.asarray(vv))
    return np.asarray(ys)


class TestOrderedStatistics:
    def test_sum_largest(self):
        vv = rng.standard_normal(7)
        got = epi_value(lambda x: ct.sum_largest(x, 3), 7, vv)
        assert abs(got - np.sort(vv)[-3:].sum()) < 1e-6

    def test_sum_smallest(self):
        vv = rng.standard_normal(7)
        got = epi_value(lambda x: ct.sum_smallest(x, 3), 7, vv,
                        maximize=True)
        assert abs(got - np.sort(vv)[:3].sum()) < 1e-6

    def test_ptp(self):
        vv = rng.standard_normal(7)
        got = epi_value(ct.ptp, 7, vv)
        assert abs(got - (vv.max() - vv.min())) < 1e-6

    def test_dotsort(self):
        vv = rng.standard_normal(7)
        w = np.array([2.0, -1.0, 0.5])
        got = epi_value(lambda x: ct.dotsort(x, w), 7, vv)
        want = float(np.dot(np.sort(vv),
                            np.sort(np.concatenate([w, np.zeros(4)]))))
        assert abs(got - want) < 1e-6

    def test_sum_largest_gradient(self):
        # smooth regularized selection: grad flows through the LP epigraph
        vv = jnp.asarray(rng.standard_normal(6))
        v = ct.Parameter(6)
        x = ct.Variable(6)
        prob = ct.Problem(
            ct.Minimize(ct.sum_squares(x - v)),
            [ct.sum_largest(x, 2) <= 1.0],
        )
        layer = CvxpyLayer(prob, parameters=[v], variables=[x])

        def f(p):
            return layer(p)[0].sum()

        g = jax.grad(f)(vv)
        eps = 1e-5
        for i in range(3):
            e = jnp.zeros(6).at[i].set(eps)
            fd = (f(vv + e) - f(vv - e)) / (2 * eps)
            assert abs(float(g[i]) - float(fd)) < 1e-3


class TestSpectralSums:
    def test_norm_nuc(self):
        V = rng.standard_normal((4, 3))
        got = epi_value(ct.norm_nuc, (4, 3), V)
        assert abs(got - np.linalg.svd(V, compute_uv=False).sum()) < 1e-5

    def test_lambda_sum_largest(self):
        S = rng.standard_normal((4, 4))
        S = 0.5 * (S + S.T)
        got = epi_value(lambda X: ct.lambda_sum_largest(X, 2), (4, 4), S)
        assert abs(got - np.sort(np.linalg.eigvalsh(S))[-2:].sum()) < 1e-5

    def test_lambda_sum_smallest(self):
        S = rng.standard_normal((4, 4))
        S = 0.5 * (S + S.T)
        got = epi_value(lambda X: ct.lambda_sum_smallest(X, 2), (4, 4), S,
                        maximize=True)
        assert abs(got - np.sort(np.linalg.eigvalsh(S))[:2].sum()) < 1e-5


class TestHarmonicMeanTv:
    def test_harmonic_mean(self):
        vp = rng.uniform(0.5, 2.0, size=5)
        got = epi_value(ct.harmonic_mean, 5, vp, maximize=True)
        assert abs(got - 5.0 / np.sum(1.0 / vp)) < 1e-6

    def test_tv_1d(self):
        vv = rng.standard_normal(7)
        got = epi_value(ct.tv, 7, vv)
        assert abs(got - np.abs(np.diff(vv)).sum()) < 1e-6

    def test_tv_2d(self):
        V2 = rng.standard_normal((4, 5))
        got = epi_value(ct.tv, (4, 5), V2)
        dv = V2[1:, :-1] - V2[:-1, :-1]
        dh = V2[:-1, 1:] - V2[:-1, :-1]
        assert abs(got - np.sqrt(dv ** 2 + dh ** 2).sum()) < 1e-6

    def test_tv_denoising_gradient(self):
        # the signal-denoising workload: prox of TV, grad wrt the signal
        vv = jnp.asarray(rng.standard_normal(6))
        v = ct.Parameter(6)
        x = ct.Variable(6)
        prob = ct.Problem(
            ct.Minimize(ct.sum_squares(x - v) + 0.5 * ct.tv(x))
        )
        layer = CvxpyLayer(prob, parameters=[v], variables=[x])

        def f(p):
            return (layer(p)[0] ** 2).sum()

        g = jax.grad(f)(vv)
        eps = 1e-5
        for i in range(3):
            e = jnp.zeros(6).at[i].set(eps)
            fd = (f(vv + e) - f(vv - e)) / (2 * eps)
            assert abs(float(g[i]) - float(fd)) < 1e-3


class TestMatrixNorms:
    def test_mixed_norm_21(self):
        M = rng.standard_normal((3, 4))
        got = epi_value(lambda X: ct.mixed_norm(X, 2, 1), (3, 4), M)
        assert abs(got - np.linalg.norm(M, axis=1).sum()) < 1e-6

    def test_mixed_norm_11(self):
        M = rng.standard_normal((3, 4))
        got = epi_value(lambda X: ct.mixed_norm(X, 1, 1), (3, 4), M)
        assert abs(got - np.abs(M).sum()) < 1e-6

    def test_mixed_norm_inf2(self):
        M = rng.standard_normal((3, 4))
        got = epi_value(lambda X: ct.mixed_norm(X, np.inf, 2), (3, 4), M)
        assert abs(got - np.linalg.norm(np.abs(M).max(axis=1))) < 1e-6

    def test_induced_1(self):
        M = rng.standard_normal((3, 4))
        got = epi_value(lambda X: ct.norm(X, 1), (3, 4), M)
        assert abs(got - np.abs(M).sum(axis=0).max()) < 1e-6

    def test_induced_inf(self):
        M = rng.standard_normal((3, 4))
        got = epi_value(lambda X: ct.norm(X, "inf"), (3, 4), M)
        assert abs(got - np.abs(M).sum(axis=1).max()) < 1e-6

    def test_spectral(self):
        M = rng.standard_normal((3, 4))
        got = epi_value(lambda X: ct.norm(X, 2), (3, 4), M)
        assert abs(got - np.linalg.norm(M, 2)) < 1e-5

    def test_norm_nuc_via_norm(self):
        M = rng.standard_normal((3, 4))
        got = epi_value(lambda X: ct.norm(X, "nuc"), (3, 4), M)
        assert abs(got - np.linalg.svd(M, compute_uv=False).sum()) < 1e-5

    def test_fro_still_frobenius(self):
        M = rng.standard_normal((3, 4))
        got = epi_value(lambda X: ct.norm(X, "fro"), (3, 4), M)
        assert abs(got - np.linalg.norm(M)) < 1e-6


class TestNewAffineMaps:
    def test_vec_default_F(self):
        M = rng.standard_normal((3, 4))
        got = affine_value(ct.vec, (3, 4), M, (12,))
        np.testing.assert_allclose(got, M.reshape(-1, order="F"), atol=1e-7)

    def test_upper_tri(self):
        S4 = rng.standard_normal((4, 4))
        got = affine_value(ct.upper_tri, (4, 4), S4, (6,))
        want = np.array([S4[i, j] for i in range(4) for j in range(i + 1, 4)])
        np.testing.assert_allclose(got, want, atol=1e-7)

    def test_diff_k2(self):
        vv = rng.standard_normal(7)
        got = affine_value(lambda x: ct.diff(x, 2), 7, vv, (5,))
        np.testing.assert_allclose(got, np.diff(vv, 2), atol=1e-7)

    def test_outer(self):
        vv = rng.standard_normal(7)
        y = np.array([1.0, -2.0])
        got = affine_value(lambda x: ct.outer(x, y), 7, vv,
                           (7, 2)).reshape(7, 2)
        np.testing.assert_allclose(got, np.outer(vv, y), atol=1e-7)

    def test_partial_trace_axis0(self):
        K = rng.standard_normal((6, 6))
        got = affine_value(lambda X: ct.partial_trace(X, (2, 3), 0),
                           (6, 6), K, (3, 3)).reshape(3, 3)
        np.testing.assert_allclose(got, K[:3, :3] + K[3:, 3:], atol=1e-7)

    def test_partial_trace_axis1(self):
        K = rng.standard_normal((6, 6))
        got = affine_value(lambda X: ct.partial_trace(X, (2, 3), 1),
                           (6, 6), K, (2, 2)).reshape(2, 2)
        want = np.array(
            [[np.trace(K[i * 3:(i + 1) * 3, j * 3:(j + 1) * 3])
              for j in range(2)] for i in range(2)]
        )
        np.testing.assert_allclose(got, want, atol=1e-7)

    def test_partial_transpose(self):
        K = rng.standard_normal((6, 6))
        got = affine_value(lambda X: ct.partial_transpose(X, (2, 3), 0),
                           (6, 6), K, (6, 6)).reshape(6, 6)
        want = np.block([[K[:3, :3], K[3:, :3]], [K[:3, 3:], K[3:, 3:]]])
        np.testing.assert_allclose(got, want, atol=1e-7)


class TestValidation:
    def test_sum_largest_bad_k(self):
        x = ct.Variable(4)
        with pytest.raises(Exception):
            ct.sum_largest(x, 5).shape  # noqa: B018

    def test_dotsort_w_too_long(self):
        x = ct.Variable(3)
        with pytest.raises(Exception):
            ct.dotsort(x, np.ones(4)).shape  # noqa: B018

    def test_tv_needs_2x2(self):
        X = ct.Variable((1, 5))
        with pytest.raises(Exception):
            ct.tv(X)


class TestSuppFunc:
    """sigma_S via sandbox dualization (expressions/atoms/suppfunc.py):
    closed-form support functions of box/ball/simplex/spectrahedron."""

    def _pinned(self, f, pv, shape=None):
        shape = shape if shape is not None else np.shape(pv)
        x = ct.Variable(shape)
        p = ct.Parameter(shape)
        t = ct.Variable()
        prob = ct.Problem(ct.Minimize(t), [x == p, f(x) <= t])
        layer = CvxpyLayer(prob, parameters=[p], variables=[t])
        (ts,) = layer(jnp.asarray(pv))
        return float(ts)

    def test_box_is_l1(self):
        pv = rng.standard_normal(4)
        y = ct.Variable(4)
        f = ct.suppfunc(y, [y <= 1, y >= -1])
        np.testing.assert_allclose(
            self._pinned(f, pv), np.abs(pv).sum(), atol=1e-7
        )

    def test_ball_is_l2(self):
        pv = rng.standard_normal(4)
        y = ct.Variable(4)
        f = ct.suppfunc(y, [ct.norm(y, 2) <= 1])
        np.testing.assert_allclose(
            self._pinned(f, pv), np.linalg.norm(pv), atol=1e-7
        )

    def test_simplex_is_max(self):
        pv = rng.standard_normal(4)
        y = ct.Variable(4, nonneg=True)
        f = ct.suppfunc(y, [ct.sum(y) == 1])
        np.testing.assert_allclose(
            self._pinned(f, pv), pv.max(), atol=1e-7
        )

    def test_param_box_gradient(self):
        # S = [0, b]^n: sigma(x) = sum b*pos(x); d sigma / d b = pos(x)
        n = 4
        pv = rng.standard_normal(n)
        bv = np.abs(rng.standard_normal(n)) + 0.5
        y = ct.Variable(n)
        b = ct.Parameter(n, pos=True)
        x = ct.Variable(n)
        p = ct.Parameter(n)
        t = ct.Variable()
        f = ct.suppfunc(y, [y >= 0, y <= b])
        prob = ct.Problem(ct.Minimize(t), [x == p, f(x) <= t])
        layer = CvxpyLayer(prob, parameters=[p, b], variables=[t])
        (ts,) = layer(jnp.asarray(pv), jnp.asarray(bv))
        np.testing.assert_allclose(
            float(ts), np.sum(bv * np.maximum(pv, 0)), atol=1e-7
        )
        g = jax.grad(lambda b_: layer(jnp.asarray(pv), b_)[0])(
            jnp.asarray(bv)
        )
        np.testing.assert_allclose(
            np.asarray(g), np.maximum(pv, 0), atol=1e-6
        )

    def test_spectrahedron_is_lambda_max(self):
        m = 3
        Q = rng.standard_normal((m, m))
        X = (Q + Q.T) / 2
        Y = ct.Variable((m, m))
        f = ct.suppfunc(Y, [ct.PSD(Y), ct.trace(Y) <= 1])
        got = self._pinned(f, X)
        np.testing.assert_allclose(
            got, max(np.linalg.eigvalsh(X).max(), 0.0), atol=1e-6
        )

    def test_entropy_ball(self):
        # exp-cone set via the dual-exp linear image:
        # S = {y in simplex : entropy(y) >= 0.9}; oracle = SLSQP sup
        from scipy.optimize import minimize

        n = 4
        pv = rng.standard_normal(n)
        y = ct.Variable(n, nonneg=True)
        f = ct.suppfunc(
            y, [ct.sum(y) == 1, ct.sum(ct.entr(y)) >= 0.9]
        )
        got = self._pinned(f, pv)
        cons = [
            {"type": "eq", "fun": lambda z: z.sum() - 1},
            {"type": "ineq",
             "fun": lambda z:
                 -(z * np.log(np.maximum(z, 1e-300))).sum() - 0.9},
        ]
        r = minimize(lambda z: -pv @ z, np.ones(n) / n,
                     bounds=[(1e-9, None)] * n, constraints=cons,
                     method="SLSQP",
                     options={"maxiter": 500, "ftol": 1e-14})
        np.testing.assert_allclose(got, -r.fun, atol=1e-6)

    def test_pnorm_ball_dual_norm(self):
        # pow-cone set via the dual-pow scaling: sigma of the p-ball is
        # the dual norm
        n = 5
        pv = rng.standard_normal(n)
        y = ct.Variable(n)
        f = ct.suppfunc(y, [ct.pnorm(y, 3) <= 1])
        got = self._pinned(f, pv)
        want = np.sum(np.abs(pv) ** 1.5) ** (1 / 1.5)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_rejections(self):
        y = ct.Variable(3)
        z = ct.Variable(3)
        with pytest.raises(ValueError):
            ct.suppfunc(y, [y + z >= 0])(ct.Variable(3))
        with pytest.raises(ValueError):
            ct.suppfunc(y, [y >= 0])(ct.Variable(4))


class TestPartialOptimize:
    """inf/sup-projection expression (expressions/atoms/
    partial_optimize.py) against closed-form envelopes."""

    def test_moreau_envelope(self):
        # inf_z ||z-x||^2 + ||z-a||^2 = 0.5 ||x-a||^2
        n = 4
        x = ct.Variable(n)
        z = ct.Variable(n)
        a = ct.Parameter(n)
        p = ct.Parameter(n)
        t = ct.Variable()
        inner = ct.Problem(
            ct.Minimize(ct.sum_squares(z - x) + ct.sum_squares(z - a))
        )
        g = ct.partial_optimize(inner, opt_vars=[z])
        prob = ct.Problem(ct.Minimize(t), [x == p, g <= t])
        layer = CvxpyLayer(prob, parameters=[p, a], variables=[t])
        pv = rng.standard_normal(n)
        av = rng.standard_normal(n)
        (ts,) = layer(jnp.asarray(pv), jnp.asarray(av))
        np.testing.assert_allclose(
            float(ts), 0.5 * np.sum((pv - av) ** 2), atol=1e-7
        )
        ga = jax.grad(lambda a_: layer(jnp.asarray(pv), a_)[0])(
            jnp.asarray(av)
        )
        np.testing.assert_allclose(np.asarray(ga), -(pv - av), atol=1e-6)

    def test_coupled_constraints(self):
        # inf_z {c'z : z >= x} = c'x for c >= 0 (dont_opt_vars form)
        n = 4
        x = ct.Variable(n)
        z = ct.Variable(n)
        p = ct.Parameter(n)
        t = ct.Variable()
        cvec = np.abs(rng.standard_normal(n)) + 0.1
        inner = ct.Problem(
            ct.Minimize(ct.Constant(cvec) @ z), [z >= x]
        )
        g = ct.partial_optimize(inner, dont_opt_vars=[x])
        prob = ct.Problem(ct.Minimize(t), [x == p, g <= t])
        layer = CvxpyLayer(prob, parameters=[p], variables=[t])
        pv = rng.standard_normal(n)
        (ts,) = layer(jnp.asarray(pv))
        np.testing.assert_allclose(float(ts), cvec @ pv, atol=1e-7)

    def test_sup_concave(self):
        # sup_z {-||z||^2 - ||z-x||^2} = -||x||^2 / 2
        n = 4
        x = ct.Variable(n)
        z = ct.Variable(n)
        p = ct.Parameter(n)
        t = ct.Variable()
        inner = ct.Problem(
            ct.Maximize(-ct.sum_squares(z) - ct.sum_squares(z - x))
        )
        h = ct.partial_optimize(inner, opt_vars=[z])
        prob = ct.Problem(ct.Maximize(t), [x == p, h >= t])
        layer = CvxpyLayer(prob, parameters=[p], variables=[t])
        pv = rng.standard_normal(n)
        (ts,) = layer(jnp.asarray(pv))
        np.testing.assert_allclose(
            float(ts), -0.5 * np.sum(pv ** 2), atol=1e-7
        )

    def test_rejects_bilinear(self):
        z = ct.Variable(3)
        x = ct.Variable(3)
        inner = ct.Problem(ct.Maximize(-ct.sum_squares(z) + x @ z))
        with pytest.raises(ValueError):
            ct.partial_optimize(inner, opt_vars=[z])
