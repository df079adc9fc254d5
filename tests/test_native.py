"""Native canon kernels: equivalence with the pure-numpy/scipy
fallbacks, and the construction-time guard they exist to protect.

The kernels accelerate the one-time canonicalization joins/linear maps
(the role of CVXPY's cvxcore C++ backend in the reference stack,
cvxpylayers utils/parse_args.py:447-462); every result must be
bit-identical (modulo entry order) to the fallback."""

import time

import numpy as np
import pytest
import scipy.sparse as sp

from cvxpylayers_tpu.canon.tensor_rep import TensorRep
from cvxpylayers_tpu.native import coo_matmat, join_pairs, native_available
from cvxpylayers_tpu.native.ops import _as_i64

rng = np.random.default_rng(7)


def _entries_set(rep: TensorRep):
    return sorted(
        zip(rep.rows.tolist(), rep.var_cols.tolist(),
            rep.param_cols.tolist(), np.round(rep.vals, 12).tolist())
    )


class TestJoinPairs:
    def test_matches_numpy_fallback(self):
        ka = rng.integers(0, 40, size=200)
        kb = rng.integers(0, 40, size=150)
        ia, ib = join_pairs(ka, kb)
        # brute force oracle
        exp = sorted(
            (i, j) for i in range(ka.size) for j in range(kb.size)
            if ka[i] == kb[j]
        )
        got = sorted(zip(ia.tolist(), ib.tolist()))
        assert got == exp


@pytest.mark.skipif(not native_available(), reason="no native toolchain")
class TestCooMatmat:
    def test_matches_scipy_path(self):
        n_rows, n_out, nnz = 30, 17, 120
        rep = TensorRep(
            n_rows,
            rng.integers(0, n_rows, nnz).astype(np.int64),
            rng.integers(-1, 9, nnz).astype(np.int64),
            rng.integers(-1, 5, nnz).astype(np.int64),
            rng.standard_normal(nnz),
        )
        L = sp.random(n_out, n_rows, density=0.2, random_state=3)

        out = coo_matmat(rep.rows, rep.var_cols, rep.param_cols, rep.vals,
                         sp.csc_matrix(L))
        assert out is not None
        native_rep = TensorRep(n_out, *out)

        # scipy oracle (the fallback branch of apply_linear)
        E = sp.csc_matrix(
            (rep.vals, (rep.rows, np.arange(rep.nnz))),
            shape=(n_rows, rep.nnz),
        )
        P = (sp.csr_matrix(L) @ E).tocoo()
        scipy_rep = TensorRep(
            n_out, P.row.astype(np.int64), rep.var_cols[P.col],
            rep.param_cols[P.col], P.data,
        )
        assert _entries_set(native_rep) == _entries_set(scipy_rep)

    def test_apply_linear_end_to_end_values(self):
        # whole-pipeline check: apply_linear (which now prefers the
        # native kernel) evaluates identically to a dense matmul
        n_rows, n_out = 12, 8
        nnz = 40
        rep = TensorRep(
            n_rows,
            rng.integers(0, n_rows, nnz).astype(np.int64),
            rng.integers(-1, 6, nnz).astype(np.int64),
            rng.integers(-1, 3, nnz).astype(np.int64),
            rng.standard_normal(nnz),
        )
        L = sp.random(n_out, n_rows, density=0.3, random_state=5)
        out_rep = rep.apply_linear(L)
        x_ext = rng.standard_normal(7)   # 6 vars + const
        p_ext = rng.standard_normal(4)   # 3 params + const
        np.testing.assert_allclose(
            out_rep.eval(x_ext, p_ext),
            np.asarray(L @ rep.eval(x_ext, p_ext).reshape(-1)).reshape(-1),
            atol=1e-12,
        )

    def test_int32_scipy_indices_accepted(self):
        # scipy CSC uses int32 indices by default; the wrapper must coerce
        L = sp.eye(5).tocsc()
        rep = TensorRep.constant(np.arange(1.0, 6.0))
        out = coo_matmat(rep.rows, rep.var_cols, rep.param_cols, rep.vals,
                         L)
        assert out is not None
        got = TensorRep(5, *out)
        np.testing.assert_allclose(
            got.eval(np.ones(1), np.ones(1)), np.arange(1.0, 6.0)
        )

    def test_as_i64_copies_only_when_needed(self):
        a = np.arange(5, dtype=np.int64)
        assert _as_i64(a) is a or _as_i64(a).base is a


class TestConstructionTime:
    def test_large_elementwise_layer_constructs_fast(self):
        # the docs claim n=5000 elementwise canonicalization stays O(n);
        # guard it (VERDICT r2 next-round item 9)
        import cvxpylayers_tpu as ct

        n = 5000
        t0 = time.perf_counter()
        x = ct.Variable(n)
        v = ct.Parameter(n)
        prob = ct.Problem(
            ct.Minimize(ct.sum(ct.huber(x - v))), [x >= -2, x <= 2]
        )
        ct.CvxpyLayer(prob, parameters=[v], variables=[x])
        dt = time.perf_counter() - t0
        assert dt < 4.0, f"n=5000 elementwise construction took {dt:.1f}s"
