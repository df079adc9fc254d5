"""Masked-loop batched linear algebra (solver/batched_linalg.py):
the custom-call-free f32 factorizations behind the IPM condensed KKT
and the spectral polish. Oracles: numpy f64 LAPACK."""

import jax
import jax.numpy as jnp
import numpy as np

from cvxpylayers_tpu.solver.batched_linalg import (
    MASKED_MAX_DIM,
    chol_masked,
    house_qr_r,
    spd_inv_via_chol,
    tri_inv_masked,
    use_masked,
)

rng = np.random.default_rng(17)


def _spd(B, n):
    G = rng.standard_normal((B, n, n))
    return np.einsum("bij,bkj->bik", G, G) + 2 * n * np.eye(n)


class TestCholMasked:
    def test_matches_numpy_f64(self):
        A = _spd(8, 23)
        L = jax.jit(jax.vmap(chol_masked))(jnp.asarray(A))
        L_ref = np.linalg.cholesky(A)
        np.testing.assert_allclose(np.asarray(L), L_ref,
                                   rtol=1e-10, atol=1e-10)

    def test_f32(self):
        A64 = _spd(8, 40)
        A = jnp.asarray(A64, jnp.float32)
        L = jax.jit(jax.vmap(chol_masked))(A)
        L_ref = np.linalg.cholesky(np.asarray(A, np.float64))
        err = np.max(np.abs(np.asarray(L, np.float64) - L_ref))
        assert err < 1e-4 * np.max(np.abs(L_ref))


class TestHouseQrR:
    def test_rtr_equals_mtm(self):
        M = rng.standard_normal((6, 37, 16))
        R = jax.jit(jax.vmap(house_qr_r))(jnp.asarray(M))
        R = np.asarray(R)
        assert np.allclose(np.triu(R), R)  # upper triangular
        np.testing.assert_allclose(
            np.einsum("bij,bik->bjk", R, R),
            np.einsum("bij,bik->bjk", M, M),
            rtol=1e-10, atol=1e-10,
        )

    def test_matches_lapack_up_to_row_signs(self):
        M = rng.standard_normal((31, 12))
        R = np.asarray(house_qr_r(jnp.asarray(M)))
        R_ref = np.linalg.qr(M, mode="r")
        signs = np.sign(np.diagonal(R)) * np.sign(np.diagonal(R_ref))
        np.testing.assert_allclose(R, signs[:, None] * R_ref,
                                   rtol=1e-10, atol=1e-10)

    def test_square(self):
        M = rng.standard_normal((9, 9))
        R = np.asarray(house_qr_r(jnp.asarray(M)))
        np.testing.assert_allclose(R.T @ R, M.T @ M,
                                   rtol=1e-9, atol=1e-9)


class TestTriInv:
    def test_lower_and_upper(self):
        L = np.tril(rng.standard_normal((14, 14))) + 4 * np.eye(14)
        Li = np.asarray(tri_inv_masked(jnp.asarray(L)))
        np.testing.assert_allclose(Li @ L, np.eye(14), atol=1e-10)
        Ui = np.asarray(tri_inv_masked(jnp.asarray(L.T), lower=False))
        np.testing.assert_allclose(Ui @ L.T, np.eye(14), atol=1e-10)


class TestSpdInv:
    def test_matches_numpy(self):
        A = _spd(4, 19)
        Ai = jax.jit(jax.vmap(spd_inv_via_chol))(jnp.asarray(A))
        np.testing.assert_allclose(np.asarray(Ai), np.linalg.inv(A),
                                   rtol=1e-8, atol=1e-10)


class TestGate:
    def test_crossover(self):
        assert use_masked(51, 113)
        assert not use_masked(501)
        assert use_masked(MASKED_MAX_DIM)
        assert not use_masked(MASKED_MAX_DIM + 1)


class TestSocNtClosedFormInverse:
    def test_wi_is_inverse(self):
        from cvxpylayers_tpu.solver.ipm import _soc_nt_w_wi

        for d in (2, 3, 11):
            # random strictly interior SOC points
            s = rng.standard_normal(d)
            s[0] = np.linalg.norm(s[1:]) + abs(rng.standard_normal()) + 0.5
            z = rng.standard_normal(d)
            z[0] = np.linalg.norm(z[1:]) + abs(rng.standard_normal()) + 0.5
            W, Wi = _soc_nt_w_wi(jnp.asarray(s), jnp.asarray(z))
            np.testing.assert_allclose(
                np.asarray(W) @ np.asarray(Wi), np.eye(d), atol=1e-10
            )
            # NT property: W z and W^{-1} s are the same scaled point
            np.testing.assert_allclose(
                np.asarray(W) @ np.asarray(z),
                np.asarray(Wi) @ np.asarray(s), atol=1e-9,
            )


class TestBlockedQr:
    """Blocked-WY variant (kept for reference; per-column wins at bench
    shapes — see its docstring)."""

    def test_matches_per_column(self):
        M = rng.standard_normal((40, 16))
        Rb = np.asarray(house_qr_r(jnp.asarray(M)))
        from cvxpylayers_tpu.solver.batched_linalg import (
            house_qr_r_blocked, qr_r,
        )

        for R in (
            np.asarray(house_qr_r_blocked(jnp.asarray(M), panel=8)),
            np.asarray(house_qr_r_blocked(jnp.asarray(M), panel=4)),
            np.asarray(qr_r(jnp.asarray(M))),
        ):
            np.testing.assert_allclose(R.T @ R, Rb.T @ Rb,
                                       rtol=1e-9, atol=1e-9)

    def test_padding_path(self):
        from cvxpylayers_tpu.solver.batched_linalg import qr_r

        M = rng.standard_normal((60, 27))  # 27 -> padded to 32
        R = np.asarray(qr_r(jnp.asarray(M)))
        assert R.shape == (27, 27)
        np.testing.assert_allclose(R.T @ R, M.T @ M,
                                   rtol=1e-9, atol=1e-9)


class TestPallasQr:
    """The unwired Pallas QR kernel (solver/pallas_linalg.py — measured
    negative on v5e, kept as the third Pallas data point): interpret
    mode keeps its logic executed on CPU."""

    def test_interpret_matches_masked(self):
        from cvxpylayers_tpu.solver.pallas_linalg import qr_r_pallas

        B, m, n = 128, 21, 9
        M = jnp.asarray(rng.standard_normal((B, m, n)), jnp.float32)
        R = np.asarray(qr_r_pallas(M, interpret=True))
        Rm = np.asarray(jax.vmap(house_qr_r)(M))
        np.testing.assert_allclose(
            np.einsum("bij,bik->bjk", R, R),
            np.einsum("bij,bik->bjk", Rm, Rm),
            rtol=2e-4, atol=2e-4,
        )


class TestBlockedLargeN:
    """chol_blocked / tri_inv_blocked — the n=500-class replacements for
    the batched factorization custom-calls (VERDICT r3 #4). Oracle:
    LAPACK on the same matrices; non-divisible n exercises the ragged
    last panel."""

    def _spd(self, rng, n):
        M = rng.standard_normal((n, n))
        return M @ M.T + n * np.eye(n)

    def test_chol_blocked_matches_numpy(self):
        from cvxpylayers_tpu.solver.batched_linalg import chol_blocked

        rng = np.random.default_rng(0)
        for n, panel in [(100, 32), (130, 64), (64, 64), (150, 48)]:
            A = self._spd(rng, n)
            L = np.asarray(chol_blocked(jnp.asarray(A), panel=panel))
            np.testing.assert_allclose(L, np.linalg.cholesky(A),
                                       rtol=1e-10, atol=1e-8)

    def test_chol_blocked_f32_batched(self):
        from cvxpylayers_tpu.solver.batched_linalg import chol_blocked

        rng = np.random.default_rng(1)
        B, n = 4, 200
        A = np.stack([self._spd(rng, n) for _ in range(B)])
        Af = jnp.asarray(A, jnp.float32)
        L = np.asarray(jax.vmap(
            lambda a: chol_blocked(a, panel=64)
        )(Af))
        ref = np.linalg.cholesky(A)
        err = np.abs(L - ref).max() / np.abs(ref).max()
        assert err < 1e-4  # f32 with pinned-precision matmuls

    def test_tri_inv_blocked_matches_inverse(self):
        from cvxpylayers_tpu.solver.batched_linalg import (
            chol_blocked,
            tri_inv_blocked,
        )

        rng = np.random.default_rng(2)
        for n, panel in [(100, 32), (130, 64)]:
            A = self._spd(rng, n)
            L = np.asarray(chol_blocked(jnp.asarray(A), panel=panel))
            Li = np.asarray(tri_inv_blocked(jnp.asarray(L), panel=panel))
            np.testing.assert_allclose(Li @ L, np.eye(n), atol=1e-8)
            # upper-triangular path
            Ui = np.asarray(tri_inv_blocked(jnp.asarray(L.T),
                                            panel=panel, lower=False))
            np.testing.assert_allclose(L.T @ Ui, np.eye(n), atol=1e-8)

    def test_small_n_falls_back_to_masked(self):
        from cvxpylayers_tpu.solver.batched_linalg import (
            chol_blocked,
            chol_masked,
            tri_inv_blocked,
            tri_inv_masked,
        )

        rng = np.random.default_rng(3)
        A = self._spd(rng, 20)
        np.testing.assert_allclose(
            np.asarray(chol_blocked(jnp.asarray(A), panel=64)),
            np.asarray(chol_masked(jnp.asarray(A))), atol=1e-12,
        )
        L = np.asarray(chol_masked(jnp.asarray(A)))
        np.testing.assert_allclose(
            np.asarray(tri_inv_blocked(jnp.asarray(L), panel=64)),
            np.asarray(tri_inv_masked(jnp.asarray(L))), atol=1e-12,
        )
