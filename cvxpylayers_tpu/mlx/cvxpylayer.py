"""MLX frontend: mx.array in/out, gradients through mx.custom_function.

API parity with the reference's MLX layer (cvxpylayers
mlx/cvxpylayer.py:299-358): construct from the same Problem/Parameter/
Variable objects, call with mx arrays (batched or not), differentiate
with mx.grad/mx.value_and_grad. The numerics run on the JAX core; this
wrapper bridges arrays across frameworks and registers the JAX VJP as
the custom MLX vjp — the same closure pattern the reference uses to put
MLX on top of diffcp (mlx/cvxpylayer.py:421-479).

MLX only ships on Apple silicon, so this module cannot run on TPU
hosts; it imports lazily and the test suite skips it when mlx is
absent. The bridge is a host round-trip by necessity (MLX has no
device interop with JAX), mirroring the reference's numpy bridge
(mlx/cvxpylayer.py:11-22, dense numpy matrices).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

try:
    import mlx.core as mx
except ImportError as e:  # pragma: no cover - exercised only w/ mlx
    raise ImportError(
        "the mlx frontend requires MLX (pip install mlx; Apple "
        "silicon only). On TPU hosts use cvxpylayers_tpu (JAX, "
        "native) or cvxpylayers_tpu.torch."
    ) from e

import jax
import jax.numpy as jnp

from ..layer.cvxpylayer import CvxpyLayer as _JaxLayer, WarmStart


def _to_jax(a) -> jax.Array:
    return jnp.asarray(np.array(a))


def _to_mx(a):
    return mx.array(np.asarray(a))


class CvxpyLayer:
    """Callable MLX layer wrapping the JAX CvxpyLayer."""

    def __init__(self, problem, parameters: Sequence, variables: Sequence,
                 solver=None, gp: bool = False, verbose: bool = False,
                 solver_args: Optional[dict] = None, canon_backend=None):
        self._layer = _JaxLayer(
            problem, parameters, variables, solver=solver, gp=gp,
            verbose=verbose, solver_args=solver_args,
            canon_backend=canon_backend,
        )
        self._warm: Optional[tuple] = None

    def __call__(self, *params, solver_args: Optional[dict] = None,
                 warm_start: bool = False, check_status: bool = True):
        """Solve; raises SolverError on infeasible/unbounded/unconverged
        instances (the reference contract surfaced through every
        frontend, cvxpylayers tests/test_torch.py:299-316). Pass
        `check_status=False` to skip the sync + raise inside compiled
        regions."""
        layer = self._layer
        module = self
        vjp_holder = []

        ws = None
        if warm_start and self._warm is not None:
            ws = WarmStart(*(jnp.asarray(a) for a in self._warm))

        @mx.custom_function
        def solve(*arrs):
            jax_params = tuple(_to_jax(a) for a in arrs)
            batch, _ = layer._parse_batch(jax_params)
            B = batch or 1
            use_ws = ws if (ws is not None and ws.x.shape[0] == B) else None

            def call(*ps):
                kw = {"warm_start": use_ws} if use_ws is not None else {}
                outs, next_ws, status, _ = layer.solve_and_state(
                    *ps, solver_args=solver_args, **kw
                )
                return outs, (next_ws, status)

            outs, vjp_fn, (next_ws, status) = jax.vjp(call, *jax_params,
                                                      has_aux=True)
            if check_status:
                layer._maybe_raise(status)
            if warm_start:
                module._warm = tuple(np.asarray(a) for a in next_ws)
            vjp_holder.clear()
            vjp_holder.append(vjp_fn)
            return tuple(_to_mx(o) for o in outs)

        @solve.vjp
        def solve_vjp(primals, cotangents, outputs):  # noqa: F811
            del primals, outputs
            if not isinstance(cotangents, (tuple, list)):
                cotangents = (cotangents,)
            cots = tuple(_to_jax(c) for c in cotangents)
            grads = vjp_holder[0](cots)
            return tuple(_to_mx(g) for g in grads)

        return solve(*params)
