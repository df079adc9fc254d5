"""CvxpyLayer: the user-facing differentiable optimization layer.

API mirrors the reference's frontends (cvxpylayers torch/cvxpylayer.py:312-
382, jax/cvxpylayer.py:275-344):

    layer = CvxpyLayer(problem, parameters=[A, b], variables=[x])
    (x_star,) = layer(A_val, b_val)            # jnp arrays, grads flow
    x_star, eq_dual = layer(...)               # duals via c.dual_variables[0]

but is natively jit/vmap/grad-composable end to end (the property only the
Moreau-JAX path has in the reference, jax/cvxpylayer.py:239-246): the whole
forward is XLA — parameter-affine data evaluation (one matmul), dense
scatter, vmapped ADMM+Newton solve with a custom_vjp, and slice/unpack
recovery. No host callbacks anywhere.

Batching semantics (reference contract, torch/cvxpylayer.py:84-141 and
docs/guide/batching.md): each parameter may be passed with its exact shape
(unbatched) or with one leading batch dimension; batched parameters must
agree on the batch size; unbatched ones broadcast; outputs carry the batch
dimension iff any input was batched (batch size 1 is preserved, not
squeezed).
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..canon.stuffer import ConeProgram, stuff
from ..cones.projections import svec_to_sym
from ..diff.derivative import make_diff_solver
from ..expressions.constraints import DualVariable
from ..expressions.leaf import Parameter, Variable
from ..expressions.problem import Problem
from ..solver.settings import (
    DUAL_INFEASIBLE,
    MAX_ITERS,
    PRIMAL_INFEASIBLE,
    SOLVED,
    SolverSettings,
)


class SolverError(RuntimeError):
    """Raised (eagerly) when a solve fails — the analogue of
    diffcp.SolverError in the reference (tests/test_torch.py:299-316).
    Under jit/vmap, statuses are data: use solve_with_info()."""


class WarmStart(NamedTuple):
    """Warm-start state: the (x, y, s) iterates, each batched (B, dim).

    A pytree of traced arrays — thread it through jitted training loops,
    the jit-compatible analogue of the reference jax layer's warm-start
    function arguments (cvxpylayers jax/cvxpylayer.py:328-337):

        ws = None
        for step in range(T):
            (sol,), ws = layer.solve_and_state(p, warm_start=ws)
    """

    x: jax.Array
    y: jax.Array
    s: jax.Array


_SOLVER_ARG_KEYS = {
    "eps": ("eps_abs", "eps_rel"),
    "eps_abs": ("eps_abs",),
    "eps_rel": ("eps_rel",),
    "eps_gap_scale": ("eps_gap_scale",),
    "admm_eps_abs": ("admm_eps_abs",),
    "admm_eps_rel": ("admm_eps_rel",),
    "max_iters": ("max_iters", "ipm_max_iters"),
    "ipm_max_iters": ("ipm_max_iters",),
    "ipm_eps_abs": ("ipm_eps_abs",),
    "ipm_eps": ("ipm_eps_abs",),
    "schur_iters": ("schur_iters",),
    "cg_iters": ("cg_iters",),
    "epoch": ("epoch",),
    "rho": ("rho",),
    "sigma": ("sigma",),
    "alpha": ("alpha",),
    "refine_steps": ("refine_steps",),
    "scaling_iters": ("scaling_iters",),
    "adaptive_rho": ("adaptive_rho",),
    "accel_lookback": ("accel_lookback",),
    "acceleration_lookback": ("accel_lookback",),  # SCS-parity alias
    "solve_method": ("solve_method",),
    "ipm_mode": ("ipm_mode",),
    "ipm_kkt": ("ipm_kkt",),
    "psd_proj": ("psd_proj",),
    "kkt_mode": ("kkt_mode",),
    "derivative": ("derivative",),
    "assembly": ("assembly",),
    "linsys_iters": ("linsys_iters",),
    "matmul_precision": ("matmul_precision",),
    "shared_setup": ("shared_setup",),
}


# dense parameter-affine maps up to this many entries (an MXU matmul is
# the fastest evaluation when the map fits); larger maps switch to
# gather + segment-sum at O(nnz) memory — the reason the reference keeps
# these sparse (cvxpylayers jax/cvxpylayer.py:321-326): at Markowitz
# scale (n=500 => 250k params) a dense map is O(nnz * n_param) and dies.
_DENSE_MAP_LIMIT = 1 << 20


def _make_map_applier(R):
    """Build p_ext (n_param+1,) -> R @ p_ext for a scipy.sparse map R."""
    if R.shape[0] == 0:
        zero_shape = R.shape[0]

        def apply_empty(p_ext):
            return jnp.zeros(zero_shape, p_ext.dtype)

        return apply_empty
    if R.shape[0] * R.shape[1] <= _DENSE_MAP_LIMIT:
        Rd = jnp.asarray(R.toarray())

        def apply_dense(p_ext):
            # full f32: TPU's default bf16 matmul would perturb the
            # PROBLEM DATA itself at ~1e-3 relative — a hard floor on
            # every downstream accuracy claim. This matmul runs once per
            # solve; cost is negligible next to the solver iterations.
            with jax.default_matmul_precision("highest"):
                return Rd.astype(p_ext.dtype) @ p_ext

        return apply_dense
    coo = R.tocoo()
    rows = jnp.asarray(coo.row.astype(np.int32))
    cols = jnp.asarray(coo.col.astype(np.int32))
    vals = jnp.asarray(coo.data)
    n_rows = R.shape[0]

    def apply_sparse(p_ext):
        return jax.ops.segment_sum(
            vals.astype(p_ext.dtype) * p_ext[cols], rows,
            num_segments=n_rows,
        )

    return apply_sparse


def _settings_from_args(base: SolverSettings, solver_args) -> SolverSettings:
    if not solver_args:
        return base
    kw = {}
    for k, v in solver_args.items():
        if k == "solve_method":
            method = str(v).lower()
            if method not in ("admm", "ipm", "pdhg"):
                raise ValueError(
                    "solve_method must be 'admm', 'ipm' or 'pdhg', "
                    f"got {v!r}"
                )
            kw["solve_method"] = method
            continue
        if k == "derivative":
            dv = str(v).lower()
            if dv not in ("adjoint", "forward"):
                raise ValueError(
                    f"derivative must be 'adjoint' or 'forward', got {v!r}"
                )
            kw["derivative"] = dv
            continue
        if k == "kkt_mode":
            mode = str(v).lower()
            if mode not in ("auto", "spectral", "operator", "pcg"):
                raise ValueError(
                    "kkt_mode must be 'auto', 'spectral', 'operator' "
                    f"or 'pcg', got {v!r}"
                )
            kw["kkt_mode"] = mode
            continue
        if k == "ipm_mode":
            mode = str(v).lower()
            if mode not in ("auto", "hsde", "pd"):
                raise ValueError(
                    f"ipm_mode must be 'auto', 'hsde' or 'pd', got {v!r}"
                )
            kw["ipm_mode"] = mode
            continue
        if k == "ipm_kkt":
            mode = str(v).lower()
            if mode not in ("auto", "chol", "qr"):
                raise ValueError(
                    f"ipm_kkt must be 'auto', 'chol' or 'qr', got {v!r}"
                )
            kw["ipm_kkt"] = mode
            continue
        if k == "psd_proj":
            mode = str(v).lower()
            if mode not in ("auto", "ns", "exact"):
                raise ValueError(
                    f"psd_proj must be 'auto', 'ns' or 'exact', got {v!r}"
                )
            kw["psd_proj"] = mode
            continue
        if k == "assembly":
            mode = str(v).lower()
            if mode not in ("auto", "dense", "sparse"):
                raise ValueError(
                    "assembly must be 'auto', 'dense' or 'sparse', "
                    f"got {v!r}"
                )
            kw["assembly"] = mode
            continue
        if k == "matmul_precision":
            mode = str(v).lower()
            if mode not in ("default", "high", "highest"):
                raise ValueError(
                    "matmul_precision must be 'default', 'high' or "
                    f"'highest', got {v!r}"
                )
            kw["matmul_precision"] = mode
            continue
        if k == "shared_setup":
            mode = str(v).lower()
            if mode not in ("auto", "on", "off"):
                raise ValueError(
                    f"shared_setup must be 'auto', 'on' or 'off', "
                    f"got {v!r}"
                )
            kw["shared_setup"] = mode
            continue
        if k not in _SOLVER_ARG_KEYS:
            raise ValueError(f"unknown solver_args key: {k!r}")
        for field in _SOLVER_ARG_KEYS[k]:
            kw[field] = type(getattr(base, field))(v)
    return base.replace(**kw)


class CvxpyLayer:
    def __init__(
        self,
        problem: Problem,
        parameters: Sequence[Parameter],
        variables: Sequence,
        solver=None,
        gp: bool = False,
        verbose: bool = False,
        solver_args: Optional[dict] = None,
        canon_backend=None,
    ):
        del solver, canon_backend  # single native backend; kept for API parity
        if not isinstance(problem, Problem):
            # optional cvxpy interop: accept a real cvxpy.Problem when
            # cvxpy is installed (SURVEY section 7.1.2 conformance shim)
            from ..canon.cvxpy_interop import (
                convert_problem,
                is_cvxpy_problem,
            )

            if is_cvxpy_problem(problem):
                problem, parameters, variables = convert_problem(
                    problem, parameters, variables
                )
            else:
                raise ValueError(
                    "problem must be a cvxpylayers_tpu Problem (or a "
                    "cvxpy Problem, when cvxpy is installed)"
                )
        prob_params = {id(p) for p in problem.parameters()}
        given = {id(p) for p in parameters}
        if prob_params != given:
            raise ValueError(
                "The layer's parameters must be exactly the problem's "
                "parameters."
            )

        self.gp = bool(gp)
        self._gp_log_mask: List[bool] = []
        self._gp_var_map = None
        if self.gp:
            from ..canon.dgp import Dgp2Dcp, DgpError

            transformer = Dgp2Dcp()
            try:
                log_problem = transformer.transform_problem(problem)
            except DgpError as e:
                raise ValueError(f"Problem is not DGP: {e}") from e
            if not log_problem.is_dcp():
                raise ValueError(
                    "Problem is not DGP (log-log transform is not DCP)."
                )
            # remap parameters in user order; untouched params (never used
            # multiplicatively or as exponent) default to logged
            new_params = []
            for p_ in parameters:
                if id(p_) not in transformer.param_map:
                    raise ValueError(
                        f"parameter {p_.name} does not appear in the problem"
                    )
                np_, logged = transformer.param_map[id(p_)]
                new_params.append(np_)
                self._gp_log_mask.append(logged)
            self._gp_var_map = transformer.var_map
            self._gp_con_map = transformer  # (constraints rebuilt below)
            # rebuild constraint-id map: transform_constraint created new
            # constraint objects in order
            self._gp_constraint_ids = {
                oc.id: nc.id
                for oc, nc in zip(problem.constraints, log_problem.constraints)
            }
            problem = log_problem
            parameters = new_params

        if not problem.is_dcp():
            raise ValueError("Problem must be DCP (disciplined convex).")
        if not problem.is_dpp():
            raise ValueError(
                "Problem must be DPP (disciplined parametrized programming); "
                "parameters may only enter affinely."
            )
        prob_vars = {id(v) for v in problem.variables()}
        prob_cons = {c.id: c for c in problem.constraints}
        self._outputs = []
        for v in variables:
            if isinstance(v, Variable):
                if self.gp:
                    if id(v) not in self._gp_var_map:
                        raise ValueError(f"{v} is not a variable of the problem")
                    self._outputs.append(("gpvar", self._gp_var_map[id(v)]))
                    continue
                if id(v) not in prob_vars:
                    raise ValueError(f"{v} is not a variable of the problem")
                self._outputs.append(("var", v))
            elif isinstance(v, DualVariable):
                cid = v.constraint.id
                if self.gp:
                    cid = self._gp_constraint_ids.get(cid, cid)
                if cid not in prob_cons:
                    raise ValueError(
                        "dual variable does not belong to a problem constraint"
                    )
                self._outputs.append(("dual", prob_cons[cid], v.part))
            else:
                raise ValueError(
                    f"variables must be Variables or DualVariables, got {v!r}"
                )
        if not self._outputs:
            raise ValueError("variables must be a non-empty list")

        self.parameters = list(parameters)
        self.verbose = bool(verbose)
        self.prog: ConeProgram = stuff(problem, self.parameters)
        self._base_settings = _settings_from_args(
            SolverSettings(), solver_args
        )

        p = self.prog
        # static structure as device constants
        self._A_rows = jnp.asarray(p.A_rows)
        self._A_cols = jnp.asarray(p.A_cols)
        self._b_rows = jnp.asarray(p.b_rows)
        # parameter-affine maps (nnz x (n_param+1)): dense (one MXU
        # matmul) when small, gather+segment-sum when the dense map
        # would blow up (reference keeps these sparse for the same
        # reason, cvxpylayers jax/cvxpylayer.py:321-326 BCSR buffers)
        self._apply_A = _make_map_applier(p.reduced_A)
        self._apply_b = _make_map_applier(p.reduced_b)
        self._apply_q = _make_map_applier(p.reduced_q)
        self._P_rows = jnp.asarray(p.P_rows)
        self._P_cols = jnp.asarray(p.P_cols)
        self._apply_P = _make_map_applier(p.reduced_P)
        # static: does every variable column carry structural curvature?
        # (decides the f32 KKT route — Schur split needs a full P diag;
        # LPs and epigraph-aux columns without curvature go to CG-normal)
        diag_mask = np.asarray(p.P_rows) == np.asarray(p.P_cols)
        self._p_diag_full = bool(
            p.P_rows.size
            and len(set(np.asarray(p.P_rows)[diag_mask].tolist()))
            == p.n
        )
        # strictly-diagonal P (e.g. sum_squares objectives): the f32
        # Schur split inverts it elementwise, skipping the batched
        # cholesky custom-calls entirely (kkt.solve_polyhedral)
        self._p_diag_only = bool(self._p_diag_full and diag_mask.all())
        # constant-P/A detection (the reference's PA_is_constant,
        # moreau_if.py:237-256) — free at stuff time, enables the
        # shared-factor setup/solve split (solver/shared.py)
        self._pa_constant = bool(
            p.m > 0 and p.A_is_constant and p.P_is_constant
        )
        self._shared_solvers: Dict[SolverSettings, object] = {}
        self._solvers: Dict[SolverSettings, object] = {}
        self._cores: Dict[SolverSettings, object] = {}
        self._pobj_cores: Dict[SolverSettings, object] = {}
        self._warm: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]] = None
        self._sparse_ops = None  # built lazily on first sparse-route solve

    # ------------------------------------------------------------------ misc

    @property
    def n_outputs(self) -> int:
        return len(self._outputs)

    def _route(self, settings: SolverSettings) -> str:
        """'dense' or 'sparse' per-instance data representation. Dense is
        measured faster at bench sizes (n ~ 50-150); sparse is the
        large-instance route (O(nnz) matvecs, no dense (m, n) scatter,
        no factorizations — solver/matfree.py)."""
        if settings.assembly != "auto":
            return settings.assembly
        from ..solver.matfree import _DENSE_ASSEMBLY_LIMIT

        p = self.prog
        if p.m and p.m * p.n > _DENSE_ASSEMBLY_LIMIT:
            return "sparse"
        return "dense"

    def _ops(self):
        if self._sparse_ops is None:
            from ..solver.matfree import SparseOps

            p = self.prog
            self._sparse_ops = SparseOps(
                p.A_rows, p.A_cols, p.m, p.n, p.P_rows, p.P_cols
            )
        return self._sparse_ops

    def _solver(self, settings: SolverSettings):
        if settings not in self._solvers:
            if self._route(settings) == "sparse":
                from ..solver.matfree import make_matfree_diff_solver

                self._solvers[settings] = make_matfree_diff_solver(
                    self._ops(), self.prog.dims, self.prog.n, settings,
                    p_diag_only=self._p_diag_only,
                )
            else:
                self._solvers[settings] = make_diff_solver(
                    self.prog.dims, self.prog.n, settings,
                    p_diag_full=self._p_diag_full,
                    p_diag_only=self._p_diag_only,
                    p_zero=self.prog.P_rows.size == 0,
                )
        return self._solvers[settings]

    def _use_shared(self, settings: SolverSettings) -> bool:
        """True when the constant-P/A shared-factor setup/solve split
        applies (solver/shared.py; the reference's Moreau
        PA_is_constant + setup() amortization)."""
        if settings.shared_setup == "off":
            return False
        applicable = (
            self._pa_constant
            and settings.solve_method == "admm"
            and settings.accel_lookback == 0
            and self._route(settings) == "dense"
        )
        if settings.shared_setup == "on" and not applicable:
            raise ValueError(
                "shared_setup='on' requires parameter-independent P and"
                " A, solve_method='admm', accel_lookback=0 and the "
                "dense assembly route"
            )
        return applicable

    def _shared_solver(self, settings: SolverSettings):
        if settings not in self._shared_solvers:
            from ..solver.shared import make_shared_admm_solver

            self._shared_solvers[settings] = make_shared_admm_solver(
                self.prog.dims, self.prog.n, settings,
                self.prog.constant_P(), self.prog.constant_A(),
            )
        return self._shared_solvers[settings]

    def _core(self, settings: SolverSettings):
        """jitted vmapped assemble+solve, cached per settings (jit's own
        cache handles batch shapes/dtypes) — eager layer calls would
        otherwise retrace the whole solve every time."""
        if settings not in self._cores:
            if self._use_shared(settings):
                core = self._build_shared_core(settings)
            else:
                core = self._build_vmapped_core(settings)
            self._cores[settings] = jax.jit(core)
        return self._cores[settings]

    def _build_vmapped_core(self, settings: SolverSettings):
        solver = self._solver(settings)
        assemble = (self._assemble_sparse
                    if self._route(settings) == "sparse"
                    else self._assemble)

        def core(p_ext, x0, y0, s0):
            def solve_one(p_row, x0_, y0_, s0_):
                P, q, A, b = assemble(p_row)[:4]
                return solver(P, q, A, b, x0_, y0_, s0_)

            if settings.matmul_precision != "default":
                # pin EVERY matmul in the solve (not just the
                # always-pinned cancellation-critical spots): TPU f32
                # then tracks CPU f32 on borderline-degenerate
                # instances (see SolverSettings.matmul_precision)
                with jax.default_matmul_precision(
                    settings.matmul_precision
                ):
                    return jax.vmap(solve_one)(p_ext, x0, y0, s0)
            return jax.vmap(solve_one)(p_ext, x0, y0, s0)

        return core

    def _build_shared_core(self, settings: SolverSettings):
        """Two-phase constant-P/A core: shared-factor batched ADMM
        (setup amortized across the batch AND across calls — P/A are
        compile-time constants), then the standard per-instance polish
        + custom_vjp with the ADMM loop disabled (max_iters=0), warm-
        started at the shared phase's iterates. Gradients flow through
        exactly the per-instance implicit-function rules; the shared
        phase is initialization (stop_gradient), so its iterations
        never enter the autodiff graph."""
        from ..solver.settings import DUAL_INFEASIBLE, PRIMAL_INFEASIBLE

        shared = self._shared_solver(settings)
        polish_settings = settings.replace(max_iters=0, scaling_iters=0)
        solver = self._solver(polish_settings)
        # P and A are parameter-independent here: close over them as
        # UNBATCHED constants so vmap's matmul batching rule turns every
        # per-lane (m, n) matvec in the polish + custom_vjp into ONE
        # shared-operand (B, m) @ (m, n) MXU matmul (r5 — the same
        # hoisting the shared ADMM phase does, extended to the polish;
        # softmax bench 3.6k -> see bench.py note. The per-lane
        # assemble() route hid the sharing from XLA behind B identical
        # scatters). Precision: the polish CG/residual paths are
        # always pinned to full f32 (kkt.py), so the bf16
        # shared-operand trap (CLAUDE.md #4) does not bite.
        const_P = np.asarray(self.prog.constant_P())
        const_A = np.asarray(self.prog.constant_A())

        def core(p_ext, x0, y0, s0):
            def run():
                q_B, b_B = jax.vmap(self._assemble_qb)(p_ext)
                res = shared(q_B, b_B, x0, y0, s0)
                wx = jax.lax.stop_gradient(res.x)
                wy = jax.lax.stop_gradient(res.y)
                ws = jax.lax.stop_gradient(res.s)
                dtype = p_ext.dtype
                P_c = jnp.asarray(const_P, dtype)
                A_c = jnp.asarray(const_A, dtype)

                def solve_one(q_row, b_row, x0_, y0_, s0_):
                    return solver(P_c, q_row, A_c, b_row,
                                  x0_, y0_, s0_)

                x, y, s, st_in, _it = jax.vmap(solve_one)(
                    q_B, b_B, wx, wy, ws
                )
                # the polish cannot see infeasibility (it only measures
                # KKT residuals); the shared phase's certificates win
                certified = (
                    (res.status == PRIMAL_INFEASIBLE)
                    | (res.status == DUAL_INFEASIBLE)
                )
                status = jnp.where(certified, res.status, st_in)
                return x, y, s, status, res.iters

            if settings.matmul_precision != "default":
                with jax.default_matmul_precision(
                    settings.matmul_precision
                ):
                    return run()
            return run()

        return core

    def _assemble_qb(self, p_ext_row: jax.Array):
        """p_ext (n_param+1,) -> (q, b) only — the shared-route
        assembly (P and A are baked constants there)."""
        prog = self.prog
        dtype = p_ext_row.dtype
        b = jnp.zeros(prog.m, dtype).at[self._b_rows].set(
            self._apply_b(p_ext_row)
        )
        return self._apply_q(p_ext_row)[:-1], b

    # ------------------------------------------------------------- batching

    def _parse_batch(self, params) -> Tuple[Optional[int], List[bool]]:
        if len(params) != len(self.parameters):
            raise ValueError(
                f"expected {len(self.parameters)} parameters, got {len(params)}"
            )
        batch: Optional[int] = None
        batched_flags = []
        for arr, p in zip(params, self.parameters):
            shape = tuple(arr.shape)
            if shape == p.shape:
                batched_flags.append(False)
            elif len(shape) == len(p.shape) + 1 and shape[1:] == p.shape:
                batched_flags.append(True)
                if batch is None:
                    batch = shape[0]
                elif batch != shape[0]:
                    raise ValueError(
                        f"inconsistent batch sizes: {batch} vs {shape[0]} "
                        f"for parameter {p.name}"
                    )
            else:
                raise ValueError(
                    f"parameter {p.name} expects shape {p.shape} "
                    f"(or batched (B, *{p.shape})), got {shape}"
                )
        return batch, batched_flags

    def _stack_params(self, params, batch, batched_flags) -> jax.Array:
        """Build p_ext of shape (B, n_param + 1) (B=1 when unbatched)."""
        B = batch or 1
        cols = []
        log_mask = self._gp_log_mask or [False] * len(self.parameters)
        for arr, p, is_b, lg in zip(
            params, self.parameters, batched_flags, log_mask
        ):
            arr = jnp.asarray(arr)
            if lg:
                arr = jnp.log(arr)
            flat = (
                arr.reshape(B, p.size)
                if is_b
                else jnp.broadcast_to(arr.reshape(p.size), (B, p.size))
            )
            cols.append(flat)
        cols.append(jnp.ones((B, 1), dtype=cols[0].dtype if cols else jnp.float64))
        return jnp.concatenate(cols, axis=1) if cols else jnp.ones((B, 1))

    # -------------------------------------------------------------- forward

    def _assemble(self, p_ext_row: jax.Array):
        """p_ext (n_param+1,) -> dense (P, q, A, b)."""
        prog = self.prog
        dtype = p_ext_row.dtype
        A_data = self._apply_A(p_ext_row)
        b_data = self._apply_b(p_ext_row)
        q_full = self._apply_q(p_ext_row)
        A = jnp.zeros((prog.m, prog.n), dtype).at[
            self._A_rows, self._A_cols
        ].set(A_data)
        b = jnp.zeros(prog.m, dtype).at[self._b_rows].set(b_data)
        q = q_full[:-1]
        P = jnp.zeros((prog.n, prog.n), dtype)
        if prog.P_rows.size:
            P_data = self._apply_P(p_ext_row)
            P = P.at[self._P_rows, self._P_cols].add(P_data)
            P = 0.5 * (P + P.T)
        return P, q, A, b, q_full[-1]

    def _assemble_sparse(self, p_ext_row: jax.Array):
        """p_ext (n_param+1,) -> (P_data, q, A_data, b, offset): the
        static-pattern value-vector representation consumed by
        solver/matfree.py — no dense (m, n)/(n, n) scatter, so the
        per-instance footprint is O(nnz) (reference analogue: the sparse
        per-instance handoff in cvxpylayers interfaces/diffcp_if.py:46-70)."""
        prog = self.prog
        dtype = p_ext_row.dtype
        A_data = self._apply_A(p_ext_row)
        b_data = self._apply_b(p_ext_row)
        q_full = self._apply_q(p_ext_row)
        b = jnp.zeros(prog.m, dtype).at[self._b_rows].set(b_data)
        P_data = (self._apply_P(p_ext_row) if prog.P_rows.size
                  else jnp.zeros(0, dtype))
        return P_data, q_full[:-1], A_data, b, q_full[-1]

    def _recover(self, x, y, batchless_shape=False):
        outs = []
        prog = self.prog
        for entry in self._outputs:
            kind, obj = entry[0], entry[1]
            if kind == "gpvar":
                vi = prog.var_info[id(obj)]
                sl = x[vi.offset:vi.offset + int(np.prod(vi.shape or (1,)))]
                outs.append(jnp.exp(sl.reshape(vi.shape)))
            elif kind == "var":
                vi = prog.var_info[id(obj)]
                if vi.symmetric:
                    s = vi.shape[0]
                    d = s * (s + 1) // 2
                    outs.append(svec_to_sym(x[vi.offset:vi.offset + d], s))
                else:
                    sl = x[vi.offset:vi.offset + int(np.prod(vi.shape or (1,)))]
                    outs.append(sl.reshape(vi.shape))
            else:
                part = entry[2]
                di = prog.dual_info[obj.id]
                sl = y[di.offset:di.offset + di.length]
                if di.kind in ("zero", "nonneg") and di.shape is not None:
                    outs.append(sl.reshape(di.shape))
                elif di.kind == "psd":
                    outs.append(svec_to_sym(sl, di.meta))
                elif di.kind == "soc":
                    # reference dual structure (cvxpy SOC duals,
                    # tests/test_dual_variables.py:807-974): part 0 is
                    # the scalar t-dual, part 1 the X-shaped dual
                    if part == 0:
                        outs.append(sl[0].reshape(()))
                    else:
                        outs.append(sl[1:].reshape(obj.args[1].shape))
                elif di.kind in ("exp", "pow"):
                    # rows are interleaved (x_i, y_i, z_i) triples; part
                    # selects the x/y/z component, argument-shaped
                    outs.append(sl[part::3].reshape(obj.args[0].shape))
                else:
                    outs.append(sl)
        return tuple(outs)

    def __call__(self, *params, solver_args: Optional[dict] = None,
                 warm_start=False):
        """Solve and return the requested variables; raises SolverError
        eagerly on failure (jit-safe alternatives: solve_with_info /
        solve_and_state)."""
        outs, _, status, _ = self._solve(params, solver_args, warm_start)
        self._maybe_raise(status)
        return outs

    def solve_with_info(self, *params, solver_args: Optional[dict] = None,
                        warm_start=False):
        """Like __call__ but returns (outs, status, iters) and NEVER
        raises on solver failure — statuses are data, inspectable in
        eager mode and under jit/vmap alike."""
        outs, _, status, iters = self._solve(params, solver_args, warm_start)
        return outs, status, iters

    def solve_and_state(self, *params, solver_args: Optional[dict] = None,
                        warm_start=None):
        """Solve and additionally return a WarmStart pytree for the next
        call — the jit-compatible warm-start path (thread the returned
        state through your training loop as a traced value). Never raises.

        Reference analogue: warm starts as traced function arguments in
        the jax layer (cvxpylayers jax/cvxpylayer.py:328-337)."""
        outs, ws, status, iters = self._solve(
            params, solver_args, warm_start if warm_start is not None else False
        )
        return outs, ws, status, iters

    def _solve(self, params, solver_args, warm_start):
        settings = _settings_from_args(self._base_settings, solver_args)
        prog = self.prog
        batch, batched_flags = self._parse_batch(params)
        p_ext = self._stack_params(params, batch, batched_flags)
        B = p_ext.shape[0]
        n, m = prog.n, prog.m
        dtype = p_ext.dtype

        x0 = jnp.zeros((B, n), dtype)
        y0 = jnp.zeros((B, m), dtype)
        s0 = jnp.zeros((B, m), dtype)
        if isinstance(warm_start, WarmStart):
            # traced warm start: shapes are static, so a Python-level
            # check is jit-safe
            if tuple(warm_start.x.shape) != (B, n):
                raise ValueError(
                    f"warm_start batch/shape mismatch: expected ({B}, {n}),"
                    f" got {tuple(warm_start.x.shape)}"
                )
            x0 = jnp.asarray(warm_start.x, dtype)
            y0 = jnp.asarray(warm_start.y, dtype)
            s0 = jnp.asarray(warm_start.s, dtype)
        elif warm_start and self._warm is not None:
            wx, wy, ws = self._warm
            if wx.shape == (B, n):
                x0 = jnp.asarray(wx, dtype)
                y0 = jnp.asarray(wy, dtype)
                s0 = jnp.asarray(ws, dtype)

        x, y, s, status, iters = self._core(settings)(p_ext, x0, y0, s0)

        if warm_start is True:
            try:
                self._warm = (
                    np.asarray(jax.lax.stop_gradient(x)),
                    np.asarray(jax.lax.stop_gradient(y)),
                    np.asarray(jax.lax.stop_gradient(s)),
                )
            except jax.errors.TracerArrayConversionError:
                pass  # under jit the eager cache is skipped (reference
                # jax layer behaviour, cvxpylayers jax/cvxpylayer.py:551-
                # 567); use solve_and_state to warm-start jitted loops

        if self.verbose:
            # works eagerly and under jit (runtime callback); `verbose`
            # itself is static so silent calls carry zero overhead
            jax.debug.print(
                "cvxpylayers_tpu: solved {ok}/{tot} instances, "
                "iters min={mn} max={mx}, worst status={st}",
                ok=jnp.sum(status == 0), tot=status.shape[0],
                mn=jnp.min(iters), mx=jnp.max(iters),
                st=jnp.max(status),
            )

        next_ws = WarmStart(
            x=jax.lax.stop_gradient(x),
            y=jax.lax.stop_gradient(y),
            s=jax.lax.stop_gradient(s),
        )

        outs_b = jax.vmap(self._recover)(x, y)
        if batch is None:
            outs = tuple(o[0] for o in outs_b)
            st, it = status[0], iters[0]
        else:
            outs = outs_b
            st, it = status, iters
        return outs, next_ws, st, it

    def _maybe_raise(self, status):
        """Eagerly raise SolverError on failure; silently skip under trace."""
        try:
            st = np.asarray(jax.lax.stop_gradient(status))
        except jax.errors.TracerArrayConversionError:
            return
        if np.any(st == PRIMAL_INFEASIBLE):
            raise SolverError("Problem is primal infeasible.")
        if np.any(st == DUAL_INFEASIBLE):
            raise SolverError("Problem is unbounded (dual infeasible).")
        if np.any(st == MAX_ITERS):
            raise SolverError(
                "Solver did not reach the requested accuracy "
                "(max_iters). Try increasing max_iters or loosening eps."
            )


    # ----------------------------------------------------- plain-solve path

    def _pobj_core(self, settings: SolverSettings):
        """Like _core but additionally returns the canonical objective
        value 0.5 x'Px + q'x + offset — computed OUTSIDE the custom
        derivative rules, so it stays plain differentiable JAX."""
        if settings not in self._pobj_cores:
            solver = self._solver(settings)
            sparse = self._route(settings) == "sparse"
            assemble = self._assemble_sparse if sparse else self._assemble
            ops = self._ops() if sparse else None

            def core(p_ext, x0, y0, s0):
                def solve_one(p_row, x0_, y0_, s0_):
                    P, q, A, b, off = assemble(p_row)
                    x, y, s, status, iters = solver(P, q, A, b,
                                                    x0_, y0_, s0_)
                    Px = ops.P_mv(P, x) if sparse else P @ x
                    pobj = 0.5 * x @ Px + q @ x + off
                    return x, y, status, iters, pobj

                if settings.matmul_precision != "default":
                    # same pinning as _core: Problem.solve() must see
                    # the identical numerics as the layer call
                    with jax.default_matmul_precision(
                        settings.matmul_precision
                    ):
                        return jax.vmap(solve_one)(p_ext, x0, y0, s0)
                return jax.vmap(solve_one)(p_ext, x0, y0, s0)

            self._pobj_cores[settings] = jax.jit(core)
        return self._pobj_cores[settings]

    def solve_values(self, *params, solver_args: Optional[dict] = None):
        """Unbatched solve returning (outs, status, iters, canonical
        objective value). Powers Problem.solve(); never raises on solver
        failure."""
        settings = _settings_from_args(self._base_settings, solver_args)
        batch, flags = self._parse_batch(params)
        if batch is not None:
            raise ValueError("solve_values expects unbatched parameters")
        p_ext = self._stack_params(params, None, flags)
        n, m = self.prog.n, self.prog.m
        dtype = p_ext.dtype
        zeros = (jnp.zeros((1, n), dtype), jnp.zeros((1, m), dtype),
                 jnp.zeros((1, m), dtype))
        x, y, status, iters, pobj = self._pobj_core(settings)(
            p_ext, *zeros
        )
        outs_b = jax.vmap(self._recover)(x, y)
        outs = tuple(o[0] for o in outs_b)
        return outs, status[0], iters[0], pobj[0]


# cvxpy status strings (reference semantics: Problem.solve sets
# problem.status and returns the optimal value)
_STATUS_STRINGS = {
    SOLVED: "optimal",
    MAX_ITERS: "optimal_inaccurate",
    PRIMAL_INFEASIBLE: "infeasible",
    DUAL_INFEASIBLE: "unbounded",
}


def solve_problem(problem, solver_args: Optional[dict] = None,
                  gp: bool = False):
    """cvxpy-style plain solve: evaluate `Parameter.value`s, solve once,
    populate `Variable.value`, `constraint.dual_value(s)`,
    `problem.status`, `problem.value`; return the optimal value.

    The compiled layer is cached on the problem (one per gp flag), so
    re-solving after changing parameter values reuses the canonicalized
    program and the jitted solver — the parametrized-solve efficiency
    cvxpy reaches through warm re-canonicalization.
    """
    params = problem.parameters()
    for par in params:
        if par.value is None:
            raise ValueError(
                f"parameter {par.name} has no value; set Parameter.value "
                "before Problem.solve()"
            )
    cache = getattr(problem, "_solve_layers", None)
    if cache is None:
        cache = {}
        problem._solve_layers = cache
    key = bool(gp)
    if key not in cache:
        variables = list(problem.variables())
        duals = [d for c in problem.constraints for d in c.dual_variables]
        cache[key] = (
            CvxpyLayer(problem, parameters=params,
                       variables=variables + duals, gp=gp),
            variables, duals,
        )
    layer, variables, duals = cache[key]
    vals = [jnp.asarray(par.value) for par in layer.parameters]
    import time as _time
    import types as _types

    t0 = _time.perf_counter()
    outs, status, iters, pobj = layer.solve_values(
        *vals, solver_args=solver_args
    )
    jax.block_until_ready(status)
    problem.solver_stats = _types.SimpleNamespace(
        num_iters=int(iters), solve_time=_time.perf_counter() - t0,
        solver_name="cvxpylayers_tpu",
    )
    st = int(status)
    problem.status = _STATUS_STRINGS.get(st, "solver_error")
    maximize = layer.prog.maximize
    if st in (PRIMAL_INFEASIBLE, DUAL_INFEASIBLE):
        inf = float("inf")
        if st == PRIMAL_INFEASIBLE:
            problem.value = -inf if maximize else inf
        else:
            problem.value = inf if maximize else -inf
        for var in variables:
            var.value = None
        for d in duals:
            d.value = None
        return problem.value
    for var, out in zip(variables, outs[:len(variables)]):
        var.value = np.asarray(out)
    for d, out in zip(duals, outs[len(variables):]):
        d.value = np.asarray(out)
    val = float(pobj)
    if maximize:
        val = -val
    if gp:
        val = float(np.exp(val))
    problem.value = val
    return val
