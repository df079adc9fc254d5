"""Cone projection correctness.

The complete optimality criterion for Euclidean projection onto a closed
convex cone K is the Moreau decomposition:

    p = Pi_K(v)  iff  p in K,  v - p in K° = -K*,  p'(v - p) = 0.

Each projection is validated against that criterion with independent numpy
membership oracles and against closed-form special cases. Derivatives are
checked against finite differences (the exp/pow projections embed symbolic
Newton steps so autodiff yields the implicit-function derivative).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvxpylayers_tpu.cones import dims as cone_dims
from cvxpylayers_tpu.cones import projections as proj

rng = np.random.default_rng(0)


# --------------------------- numpy membership oracles -----------------------


def in_nonneg(v, tol):
    return np.all(v >= -tol)


def in_soc(v, tol):
    return np.linalg.norm(v[1:]) <= v[0] + tol


def in_exp(v, tol):
    x, y, z = v
    if y > tol:
        return y * math.exp(x / y) <= z + tol * max(1.0, abs(z))
    return y >= -tol and x <= tol and z >= -tol


def in_exp_dual(v, tol):
    u, vv, w = v
    if u < -tol:
        return w >= -tol and -u * math.exp(vv / u) <= math.e * w + tol
    return abs(u) <= tol and vv >= -tol and w >= -tol


def in_pow(v, alpha, tol):
    x, y, z = v
    if x < -tol or y < -tol:
        return False
    x, y = max(x, 0.0), max(y, 0.0)
    return x**alpha * y ** (1 - alpha) >= abs(z) - tol


def in_pow_dual(v, alpha, tol):
    u, vv, w = v
    return in_pow(np.array([u / alpha, vv / (1 - alpha), w]), alpha, tol)


def in_psd_svec(v, s, tol):
    M = np.asarray(proj.svec_to_sym(jnp.asarray(v), s))
    return np.linalg.eigvalsh(M).min() >= -tol


def check_moreau(v, p, member_K, member_Kstar, tol=1e-7):
    """Assert the Moreau optimality criterion for p = Pi_K(v)."""
    d = np.asarray(v) - np.asarray(p)
    assert member_K(np.asarray(p), tol), f"p not in K: {p}"
    # v - p in K°  <=>  -(v - p) in K*
    assert member_Kstar(-d, tol), f"v-p not in polar: {d}"
    assert abs(float(np.dot(p, d))) <= tol * (1 + np.linalg.norm(v)) ** 2


# --------------------------------- tests ------------------------------------


class TestNonNegAndSOC:
    def test_nonneg(self):
        v = rng.standard_normal(50)
        p = np.asarray(proj.project_nonneg(jnp.asarray(v)))
        np.testing.assert_allclose(p, np.maximum(v, 0))

    @pytest.mark.parametrize("d", [1, 2, 3, 10])
    def test_soc_moreau(self, d):
        f = jax.jit(proj.project_soc)
        for _ in range(20):
            v = rng.standard_normal(d) * rng.choice([0.1, 1, 10])
            p = np.asarray(f(jnp.asarray(v)))
            check_moreau(v, p, lambda u, t: in_soc(u, t), lambda u, t: in_soc(u, t))

    def test_soc_cases(self):
        # inside
        v = np.array([2.0, 1.0, 1.0])
        np.testing.assert_allclose(proj.project_soc(jnp.asarray(v)), v)
        # polar
        v = np.array([-2.0, 1.0, 1.0])
        np.testing.assert_allclose(proj.project_soc(jnp.asarray(v)), 0.0)
        # boundary formula
        v = np.array([0.0, 2.0, 0.0])
        np.testing.assert_allclose(
            proj.project_soc(jnp.asarray(v)), np.array([1.0, 1.0, 0.0])
        )


class TestExpCone:
    def _points(self, n=60):
        pts = rng.standard_normal((n, 3)) * rng.choice([0.3, 1.0, 5.0], size=(n, 1))
        # add structured points: in cone, in polar, degenerate quadrant
        pts = np.vstack(
            [
                pts,
                [[0.5, 1.0, 5.0]],  # interior
                [[-1.0, -1.0, -1.0]],  # near polar
                [[-1.0, -2.0, 3.0]],  # degenerate quadrant, t>0
                [[-1.0, -2.0, -3.0]],  # degenerate quadrant, t<0
                [[0.0, 0.0, 0.0]],
                [[1.0, 0.0, 1.0]],
            ]
        )
        return pts

    def test_moreau(self):
        f = jax.jit(proj.project_exp)
        for v in self._points():
            p = np.asarray(f(jnp.asarray(v)))
            check_moreau(v, p, in_exp, in_exp_dual, tol=1e-6)

    def test_idempotent(self):
        # Pi(Pi(v)) == Pi(v): a projection maps onto the cone, and points of
        # the cone are fixed. (The Moreau test above is the full optimality
        # criterion; a scipy SLSQP "oracle" is *less* reliable here — it
        # reports infeasible points near y=0 as closer.)
        f = jax.jit(proj.project_exp)
        for v in self._points(20):
            p = f(jnp.asarray(v))
            p2 = f(p)
            np.testing.assert_allclose(np.asarray(p2), np.asarray(p), atol=1e-8)

    def test_gradient_fd(self):
        f = proj.project_exp
        for v in [np.array([1.0, -0.5, 0.3]), np.array([-0.2, 1.5, -2.0]),
                  np.array([2.0, 0.3, 1.0])]:
            J = np.asarray(jax.jacfwd(f)(jnp.asarray(v)))
            eps = 1e-6
            J_fd = np.zeros((3, 3))
            for i in range(3):
                e = np.zeros(3)
                e[i] = eps
                J_fd[:, i] = (
                    np.asarray(f(jnp.asarray(v + e)))
                    - np.asarray(f(jnp.asarray(v - e)))
                ) / (2 * eps)
            np.testing.assert_allclose(J, J_fd, atol=1e-5)
            # projection Jacobian is symmetric PSD where differentiable
            np.testing.assert_allclose(J, J.T, atol=1e-6)


class TestPowCone:
    @pytest.mark.parametrize("alpha", [0.3, 0.5, 0.7])
    def test_moreau(self, alpha):
        f = jax.jit(proj.project_pow3)
        for _ in range(40):
            v = rng.standard_normal(3) * rng.choice([0.3, 1.0, 5.0])
            p = np.asarray(f(jnp.asarray(v), alpha))
            check_moreau(
                v, p,
                lambda u, t: in_pow(u, alpha, t),
                lambda u, t: in_pow_dual(u, alpha, t),
                tol=1e-6,
            )

    def test_z_zero(self):
        p = np.asarray(proj.project_pow3(jnp.array([-1.0, 2.0, 0.0]), 0.4))
        np.testing.assert_allclose(p, [0.0, 2.0, 0.0], atol=1e-8)

    def test_gradient_fd(self):
        alpha = 0.6
        f = lambda v: proj.project_pow3(v, alpha)
        for v in [np.array([1.0, 0.5, 2.0]), np.array([-0.3, 1.2, 0.7])]:
            J = np.asarray(jax.jacfwd(f)(jnp.asarray(v)))
            eps = 1e-6
            J_fd = np.zeros((3, 3))
            for i in range(3):
                e = np.zeros(3)
                e[i] = eps
                J_fd[:, i] = (
                    np.asarray(f(jnp.asarray(v + e)))
                    - np.asarray(f(jnp.asarray(v - e)))
                ) / (2 * eps)
            np.testing.assert_allclose(J, J_fd, atol=1e-5)


class TestPSD:
    def test_svec_roundtrip(self):
        s = 4
        M = rng.standard_normal((s, s))
        M = M + M.T
        v = proj.sym_to_svec(jnp.asarray(M))
        M2 = np.asarray(proj.svec_to_sym(v, s))
        np.testing.assert_allclose(M2, M, atol=1e-12)
        # svec preserves inner products: <A,B>_F = svec(A)'svec(B)
        B = rng.standard_normal((s, s))
        B = B + B.T
        ip_mat = float(np.sum(M * B))
        ip_vec = float(
            jnp.dot(proj.sym_to_svec(jnp.asarray(M)), proj.sym_to_svec(jnp.asarray(B)))
        )
        assert abs(ip_mat - ip_vec) < 1e-10

    def test_moreau(self):
        s = 3
        d = s * (s + 1) // 2
        f = jax.jit(proj.project_psd_svec, static_argnums=1)
        for _ in range(10):
            v = rng.standard_normal(d)
            p = np.asarray(f(jnp.asarray(v), s))
            check_moreau(
                v, p,
                lambda u, t: in_psd_svec(u, s, t),
                lambda u, t: in_psd_svec(u, s, t),  # PSD cone is self-dual
                tol=1e-8,
            )


class TestPSDNewtonSchulz:
    """r5: matmul-only NS-sign PSD projection (the first-order
    inner-loop fast path; statuses/polish keep exact eigh)."""

    def test_matches_exact_away_from_kernel(self):
        # accuracy contract: ~1e-2 absolute on O(1)-spectrum blocks,
        # much better when no eigenvalue is near zero
        s = 16
        d = s * (s + 1) // 2
        for _ in range(5):
            v = jnp.asarray(rng.standard_normal(d))
            exact = np.asarray(proj.project_psd_svec(v, s))
            ns = np.asarray(proj.project_psd_svec_ns(v, s))
            assert np.abs(exact - ns).max() < 2e-2
        # well-separated spectrum: error collapses
        A = np.diag(np.linspace(-3.0, 3.0, s))
        Q = np.linalg.qr(rng.standard_normal((s, s)))[0]
        M = Q @ A @ Q.T
        v = proj.sym_to_svec(jnp.asarray(M))
        exact = np.asarray(proj.project_psd_svec(v, s))
        ns = np.asarray(proj.project_psd_svec_ns(v, s))
        assert np.abs(exact - ns).max() < 1e-5

    def test_projector_mode_plumbing(self):
        from cvxpylayers_tpu.cones.dims import ConeDims

        dims = ConeDims(zero=1, nonneg=0, soc=(), exp=0, psd=(6,),
                        pow3=())
        v = jnp.asarray(rng.standard_normal(1 + 21))
        p_exact = np.asarray(proj.make_cone_projector(dims)(v))
        p_ns = np.asarray(
            proj.make_cone_projector(dims, psd_mode="ns")(v)
        )
        # same cone geometry, smoothed boundary
        assert np.abs(p_exact - p_ns).max() < 2e-2
        # the zero-cone block is untouched by the psd mode
        assert p_ns[0] == 0.0

    def test_sdp_layer_ns_vs_exact_inner_loop(self):
        # end-to-end: psd_proj auto (NS inner loop) and exact must
        # agree post-polish — accuracy is owned by the exact polish
        import cvxpylayers_tpu as ct

        s = 6
        X = ct.Variable((s, s), PSD=True)
        C = ct.Parameter((s, s))
        prob = ct.Problem(ct.Minimize(ct.trace(C @ X)),
                          [ct.trace(X) == 1])
        layer = ct.CvxpyLayer(prob, parameters=[C], variables=[X])
        Cv = rng.standard_normal((s, s))
        Cv = jnp.asarray(0.5 * (Cv + Cv.T))
        args = {"eps_abs": 1e-6, "eps_rel": 1e-6, "max_iters": 4000,
                "refine_steps": 10}
        (X_ns,), st_ns, _ = layer.solve_with_info(Cv, solver_args=args)
        (X_ex,), st_ex, _ = layer.solve_with_info(
            Cv, solver_args=dict(args, psd_proj="exact"))
        assert int(np.asarray(st_ns)) == 0
        assert int(np.asarray(st_ex)) == 0
        np.testing.assert_allclose(np.asarray(X_ns), np.asarray(X_ex),
                                   atol=1e-5)
        lam_min = float(np.linalg.eigvalsh(np.asarray(Cv))[0])
        assert abs(float(jnp.sum(X_ns * Cv)) - lam_min) < 1e-5


class TestProductCone:
    def test_layout_and_moreau(self):
        dims = cone_dims.ConeDims(
            zero=2, nonneg=3, soc=(3, 3, 4), exp=2, psd=(2,), pow3=(0.3, 0.6)
        )
        m = dims.total
        assert m == 2 + 3 + 10 + 6 + 3 + 6
        f = jax.jit(proj.make_cone_projector(dims))
        v = rng.standard_normal(m)
        p = np.asarray(f(jnp.asarray(v)))
        # zero block
        np.testing.assert_allclose(p[:2], 0.0)
        # nonneg block
        np.testing.assert_allclose(p[2:5], np.maximum(v[2:5], 0))
        # soc blocks
        np.testing.assert_allclose(
            p[5:8], np.asarray(proj.project_soc(jnp.asarray(v[5:8])))
        )
        np.testing.assert_allclose(
            p[11:15], np.asarray(proj.project_soc(jnp.asarray(v[11:15])))
        )
        # exp block
        np.testing.assert_allclose(
            p[15:18], np.asarray(proj.project_exp(jnp.asarray(v[15:18])))
        )
        # psd block
        np.testing.assert_allclose(
            p[21:24], np.asarray(proj.project_psd_svec(jnp.asarray(v[21:24]), 2))
        )
        # pow blocks
        np.testing.assert_allclose(
            p[24:27], np.asarray(proj.project_pow3(jnp.asarray(v[24:27]), 0.3))
        )

    def test_dual_projector_moreau_identity(self):
        dims = cone_dims.ConeDims(zero=1, nonneg=2, soc=(3,), exp=1)
        pk = proj.make_cone_projector(dims)
        pkstar = proj.make_dual_cone_projector(dims)
        v = jnp.asarray(rng.standard_normal(dims.total))
        # Moreau: v = Pi_K(v) - Pi_K*(-v)
        np.testing.assert_allclose(
            np.asarray(pk(v) - pkstar(-v)), np.asarray(v), atol=1e-9
        )

    def test_dproj_block_diagonal(self):
        dims = cone_dims.ConeDims(zero=1, nonneg=2, soc=(3,))
        D = np.asarray(proj.make_cone_dproj(dims)(jnp.asarray(rng.standard_normal(6))))
        assert D.shape == (6, 6)
        np.testing.assert_allclose(D[0, :], 0.0)  # zero cone row
        # off-block coupling must vanish
        np.testing.assert_allclose(D[1:3, 3:], 0.0)
        np.testing.assert_allclose(D[3:, 1:3], 0.0)

    def test_vmap_batch(self):
        dims = cone_dims.ConeDims(nonneg=2, soc=(3,), exp=1)
        f = jax.vmap(proj.make_cone_projector(dims))
        V = jnp.asarray(rng.standard_normal((7, dims.total)))
        P = np.asarray(f(V))
        for i in range(7):
            np.testing.assert_allclose(
                P[i], np.asarray(proj.make_cone_projector(dims)(V[i])), atol=1e-12
            )


class TestClosedFormJacobians:
    def test_matches_jacfwd(self):
        from cvxpylayers_tpu.cones.jacobians import make_cone_dproj_dense

        dims = cone_dims.ConeDims(
            zero=2, nonneg=3, soc=(3, 4), exp=2, psd=(3,), pow3=(0.4,)
        )
        f_closed = jax.jit(make_cone_dproj_dense(dims))
        f_ad = jax.jit(proj.make_cone_dproj(dims))
        for _ in range(5):
            v = jnp.asarray(rng.standard_normal(dims.total) * 1.5)
            np.testing.assert_allclose(
                np.asarray(f_closed(v)), np.asarray(f_ad(v)), atol=1e-8
            )


class TestExpCliffRegression:
    """Extreme-input regression for the exp projection: inputs whose
    boundary root a* is large made the parametrized point y*e^{a*} blow
    up by ~e^{a} x cancellation error (latent since round 1, found by a
    20k-point Moreau sweep); the y=0 face safety net bounds it."""

    def test_moreau_orthogonality_sweep(self):
        from cvxpylayers_tpu.cones.projections import project_exp

        rng = np.random.default_rng(0)
        N = 5000
        V = rng.standard_normal((N, 3)) * (10.0 ** rng.uniform(-2, 2, (N, 1)))
        P = np.asarray(jax.jit(jax.vmap(project_exp))(jnp.asarray(V)))
        D = V - P
        ortho = np.abs(np.sum(P * D, axis=1)) / np.maximum(
            1.0, np.sum(V * V, axis=1)
        )
        assert ortho.max() < 1e-6, ortho.max()
        # membership: s e^{r/s} <= t (s > 0) or the y=0 face
        r, s, t = P[:, 0], P[:, 1], P[:, 2]
        tol = 1e-8 * np.maximum(1, np.abs(V).max(1))
        viol = np.where(
            s > 1e-12,
            s * np.exp(np.minimum(r / np.maximum(s, 1e-12), 50)) - t,
            np.where((np.abs(s) <= tol) & (r <= tol) & (t >= -tol),
                     0.0, 1.0),
        )
        assert np.maximum(viol, 0).max() < 1e-10

    def test_known_cliff_points(self):
        from cvxpylayers_tpu.cones.projections import project_exp

        for v in ([0.12754856, -30.64533796, 0.15325743],
                  [0.0027298, -0.65002007, 0.18004724],
                  [0.00070501, -0.11257819, 0.35997929]):
            v = jnp.asarray(v)
            p = project_exp(v)
            assert np.all(np.isfinite(np.asarray(p)))
            # projection is no farther than the y=0 face point
            face = np.array([min(float(v[0]), 0.0), 0.0,
                             max(float(v[2]), 0.0)])
            d_p = float(jnp.sum((v - p) ** 2))
            d_f = float(np.sum((np.asarray(v) - face) ** 2))
            assert d_p <= d_f + 1e-12


class TestSpectralDproj:
    def test_eigendecomposition_matches_dense(self):
        # Q diag(lam) Q' must reconstruct the dense projection Jacobian
        # exactly, with orthogonal Q and lam in [0, 1] — closed forms for
        # soc (Householder tangent basis) and psd (Loewner operator
        # diagonalized by the svec rotation), trigonometric 3x3 eig for
        # exp/pow. This powers the (r3) spectral-Schur KKT experiments.
        from cvxpylayers_tpu.cones.jacobians import (
            make_cone_dproj_dense,
            make_cone_dproj_spectral,
        )

        dims = cone_dims.ConeDims(zero=2, nonneg=3, soc=[4, 3],
                                  exp=2, psd=[3], pow3=[0.3, 0.7])
        m = dims.total
        dense = make_cone_dproj_dense(dims)
        spec = make_cone_dproj_spectral(dims)
        for trial in range(4):
            r = np.random.default_rng(trial)
            w = r.standard_normal(m) * (2.0 if trial % 2 else 0.7)
            D = np.asarray(dense(jnp.asarray(w)))
            Q, lam = spec(jnp.asarray(w))
            Q = np.asarray(Q)
            lam = np.asarray(lam)
            np.testing.assert_allclose(Q @ Q.T, np.eye(m), atol=1e-12)
            np.testing.assert_allclose(Q @ np.diag(lam) @ Q.T, D,
                                       atol=1e-7)
            assert lam.min() >= 0.0 and lam.max() <= 1.0
