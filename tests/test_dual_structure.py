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


class TestEveryConeAtOnce:
    """One problem containing every cone family (reference signature
    test, tests/test_dual_variables.py:807-974): zero, nonneg, SOC, exp,
    PSD and pow constraints on one variable, each with an offset
    parameter. Every returned dual part must equal the finite-difference
    sensitivity of the optimal value to ITS constraint's offset — any
    cross-cone ordering or slicing error in dual recovery breaks the
    match. Dual-cone membership is checked per part."""

    def _layer(self):
        x = ct.Variable(5)
        v = ct.Parameter(5)
        e = ct.Parameter(())   # equality rhs
        r = ct.Parameter(())   # soc radius
        m = ct.Parameter(())   # lower bound on x[:4]
        pz = ct.Parameter(())  # exp z-slot offset
        po = ct.Parameter(())  # psd (0,0)-diagonal offset
        pw = ct.Parameter(())  # pow x-slot offset
        cons = [
            ct.sum(x) == e,
            x[:4] >= m,
            ct.SOC(r, x[:3]),
            ct.ExpCone(x[0] - 1.0, ct.Constant(1.0), x[3] + pz),
            ct.PSD(ct.bmat([[x[2] + 3.0 + po, x[3]],
                            [x[3], x[0] + 3.0]])),
            ct.PowCone3D(x[1] + 2.0 + pw, x[2] + 2.0, x[4], 0.6),
        ]
        duals = [d for c in cons for d in c.dual_variables]
        layer = ct.CvxpyLayer(
            ct.Problem(ct.Minimize(ct.sum_squares(x - v)), cons),
            parameters=[v, e, r, m, pz, po, pw],
            variables=[x] + duals,
        )
        return layer

    def _run(self, layer, vv, th):
        keys = ("e", "r", "m", "pz", "po", "pw")
        outs = layer(jnp.asarray(vv),
                     *(jnp.asarray(th[k]) for k in keys))

        def fstar(**kw):
            p = {**th, **kw}
            o = layer(jnp.asarray(vv),
                      *(jnp.asarray(p[k]) for k in keys))
            return float(((np.asarray(o[0]) - vv) ** 2).sum())

        d = 1e-5
        fd = {
            k: (fstar(**{k: th[k] + d}) - fstar(**{k: th[k] - d}))
            / (2 * d)
            for k in keys
        }
        return [np.asarray(o) for o in outs], fd

    def _check(self, outs, fd):
        (xs, lam_eq, lam_nn, du_t, du_x, de_x, de_y, de_z, Z,
         pw_x, pw_y, pw_z) = outs
        tol = 1e-4
        # sensitivity identities (the ordering contract): relaxing each
        # offset by +1 changes the optimal value by -that dual
        np.testing.assert_allclose(fd["e"], -float(lam_eq), atol=tol)
        np.testing.assert_allclose(fd["m"], float(lam_nn.sum()),
                                   atol=tol)
        np.testing.assert_allclose(fd["r"], -float(du_t), atol=tol)
        np.testing.assert_allclose(fd["pz"], -float(de_z), atol=tol)
        np.testing.assert_allclose(fd["po"], -float(Z[0, 0]), atol=tol)
        np.testing.assert_allclose(fd["pw"], -float(pw_x), atol=tol)
        # dual-cone membership per part
        assert (lam_nn >= -1e-8).all()
        assert np.linalg.norm(du_x) <= float(du_t) + 1e-7
        assert float(np.min(np.linalg.eigvalsh(Z))) >= -1e-7
        # exp dual cone: u < 0 active case handled via -u e^{v/u} <= e w
        u, vv_, w = float(de_x), float(de_y), float(de_z)
        if u < -1e-9:
            assert -u * np.exp(vv_ / u) <= np.e * w + 1e-6
        a = 0.6
        pu, pv, pwd = float(pw_x), float(pw_y), float(pw_z)
        assert pu >= -1e-8 and pv >= -1e-8
        if pu > 1e-9 and pv > 1e-9:
            assert ((pu / a) ** a * (pv / (1 - a)) ** (1 - a)
                    >= abs(pwd) - 1e-5)

    def test_soc_exp_psd_pow_active(self):
        layer = self._layer()
        vv = np.array([1.5, -2.0, 0.8, 1.0, -4.0])
        th = dict(e=0.7, r=0.5, m=-0.5, pz=-0.5, po=-3.0, pw=-1.8)
        outs, fd = self._run(layer, vv, th)
        self._check(outs, fd)
        # these four cones must actually be active in this configuration
        assert float(outs[3]) > 0.1        # SOC t-dual
        assert abs(float(outs[7])) > 0.1   # exp z-dual
        assert float(outs[8][0, 0]) > 0.01  # PSD dual
        assert float(outs[9]) > 0.1        # pow x-dual

    def test_eq_nonneg_exp_active(self):
        layer = self._layer()
        vv = np.array([1.5, -2.0, 0.8, 1.0, -0.5])
        th = dict(e=0.7, r=1.5, m=-0.35, pz=-0.55, po=0.0, pw=0.0)
        outs, fd = self._run(layer, vv, th)
        self._check(outs, fd)
        assert abs(float(outs[1])) > 1e-3  # equality dual
        assert float(np.asarray(outs[2]).sum()) > 0.1  # nonneg active
        assert abs(float(outs[7])) > 0.01  # exp z-dual
