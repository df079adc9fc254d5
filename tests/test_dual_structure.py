"""Per-cone dual variable structure (reference contract:
tests/test_dual_variables.py:807-974): SOC constraints expose
(t-dual, X-dual) parts, Exp/Pow cones expose (x, y, z)-part duals, each
with the constraint argument's shape — validated against closed forms
and dual-cone membership/complementarity."""

import jax.numpy as jnp
import numpy as np

import cvxpylayers_tpu as ct
from cvxpylayers_tpu import CvxpyLayer

rng = np.random.default_rng(13)


class TestSocDualParts:
    def test_closed_form(self):
        # min -v'x s.t. ||x|| <= 1: x* = v/||v||; KKT gives X-dual = -v?
        # stationarity -v + u1 = 0 happens in the internal sign
        # convention; validate via self-duality + complementarity +
        # stationarity identities instead of guessing signs.
        n = 4
        x = ct.Variable(n)
        v = ct.Parameter(n)
        con = ct.SOC(ct.Constant(1.0), x)
        prob = ct.Problem(ct.Minimize(-(v @ x)), [con])
        layer = CvxpyLayer(
            prob, parameters=[v],
            variables=[x, con.dual_variables[0], con.dual_variables[1]],
        )
        vv = rng.standard_normal(n)
        xs, du_t, du_x = layer(jnp.asarray(vv))
        assert du_t.shape == ()
        assert du_x.shape == (n,)
        np.testing.assert_allclose(
            np.asarray(xs), vv / np.linalg.norm(vv), atol=1e-7
        )
        # dual feasibility (SOC self-dual): ||X-dual|| <= t-dual
        assert np.linalg.norm(np.asarray(du_x)) <= float(du_t) + 1e-7
        # stationarity: the objective gradient -v is balanced by the
        # constraint dual; |X-dual| = |v| and alignment with x*
        np.testing.assert_allclose(float(du_t), np.linalg.norm(vv),
                                   atol=1e-6)
        np.testing.assert_allclose(
            np.abs(np.asarray(du_x) @ np.asarray(xs)),
            np.linalg.norm(vv), atol=1e-6,
        )

    def test_batched_shapes(self):
        n = 3
        x = ct.Variable(n)
        v = ct.Parameter(n)
        con = ct.SOC(ct.Constant(1.0), x)
        prob = ct.Problem(ct.Minimize(ct.sum_squares(x - v)), [con])
        layer = CvxpyLayer(
            prob, parameters=[v],
            variables=[con.dual_variables[0], con.dual_variables[1]],
        )
        vv = jnp.asarray(rng.standard_normal((5, n)) * 2)
        du_t, du_x = layer(vv)
        assert du_t.shape == (5,)
        assert du_x.shape == (5, n)


class TestExpDualParts:
    def test_closed_form(self):
        # min z s.t. (a, 1, z) in Kexp  ->  z* = e^a with duals
        # (x,y,z)-parts = (-e^a, (a-1) e^a, 1)
        z = ct.Variable(())
        a = ct.Parameter(())
        con = ct.ExpCone(a, ct.Constant(1.0), z)
        prob = ct.Problem(ct.Minimize(z), [con])
        layer = CvxpyLayer(
            prob, parameters=[a],
            variables=[z] + list(con.dual_variables),
        )
        av = 0.3
        zs, dx, dy, dz = layer(jnp.asarray(av))
        assert dx.shape == () and dy.shape == () and dz.shape == ()
        np.testing.assert_allclose(float(zs), np.exp(av), atol=1e-7)
        np.testing.assert_allclose(float(dz), 1.0, atol=1e-6)
        np.testing.assert_allclose(float(dx), -np.exp(av), atol=1e-5)
        np.testing.assert_allclose(float(dy), (av - 1) * np.exp(av),
                                   atol=1e-5)

    def test_vector_shapes(self):
        k = 3
        zv = ct.Variable(k)
        av = ct.Parameter(k)
        con = ct.ExpCone(av, ct.Constant(np.ones(k)), zv)
        prob = ct.Problem(ct.Minimize(ct.sum(zv)), [con])
        layer = CvxpyLayer(
            prob, parameters=[av],
            variables=list(con.dual_variables),
        )
        dx, dy, dz = layer(jnp.asarray(rng.standard_normal(k) * 0.3))
        assert dx.shape == (k,) and dy.shape == (k,) and dz.shape == (k,)
        np.testing.assert_allclose(np.asarray(dz), np.ones(k), atol=1e-6)


class TestPowDualParts:
    def test_membership_and_complementarity(self):
        # min z s.t. (a, b, -z) in Pow(alpha) pushes z down to
        # -a^alpha b^(1-alpha); duals must lie in the dual power cone
        # with zero complementarity gap
        alpha = 0.4
        z = ct.Variable(())
        a = ct.Parameter(())
        con = ct.PowCone3D(a, ct.Constant(1.5), z, alpha)
        prob = ct.Problem(ct.Maximize(z), [con])
        layer = CvxpyLayer(
            prob, parameters=[a],
            variables=[z] + list(con.dual_variables),
        )
        av = 2.0
        zs, dx, dy, dz = layer(jnp.asarray(av))
        assert dx.shape == () and dy.shape == () and dz.shape == ()
        zstar = av**alpha * 1.5 ** (1 - alpha)
        np.testing.assert_allclose(float(zs), zstar, atol=1e-6)
        # dual cone membership: (u/alpha)^alpha (v/(1-alpha))^(1-alpha)
        # >= |w|
        u, v_, w = float(dx), float(dy), float(dz)
        assert u >= -1e-8 and v_ >= -1e-8
        lhs = (max(u, 0) / alpha) ** alpha * (
            max(v_, 0) / (1 - alpha)
        ) ** (1 - alpha)
        assert lhs >= abs(w) - 1e-6
        # complementarity: s . y = 0 with s = (a, 1.5, z*)
        gap = av * u + 1.5 * v_ + zstar * w
        np.testing.assert_allclose(gap, 0.0, atol=1e-5)
