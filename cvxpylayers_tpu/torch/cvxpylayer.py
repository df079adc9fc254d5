"""PyTorch frontend: torch tensors in/out, gradients through torch.autograd.

API parity with the reference's torch layer (cvxpylayers
torch/cvxpylayer.py:312-382): construct from the same Problem/Parameter/
Variable objects, call with torch tensors (batched or not), backpropagate
with .backward(). The numerics run on the JAX core (TPU-native solver);
this wrapper bridges tensors across frameworks and stashes the JAX VJP for
the backward pass — the same pattern the reference uses to put torch on
top of diffcp/Moreau.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

try:
    import torch
except ImportError as e:  # pragma: no cover
    raise ImportError(
        "the torch frontend requires PyTorch (pip install torch)"
    ) from e

import jax
import jax.numpy as jnp

from ..layer.cvxpylayer import CvxpyLayer as _JaxLayer, WarmStart


def _to_jax(t: "torch.Tensor") -> jax.Array:
    return jnp.asarray(t.detach().cpu().numpy())


def _to_torch(a: jax.Array, like: "torch.Tensor") -> "torch.Tensor":
    return torch.as_tensor(
        np.asarray(a), dtype=like.dtype, device=like.device
    )


class CvxpyLayer(torch.nn.Module):
    """torch.nn.Module wrapping the JAX CvxpyLayer."""

    def __init__(self, problem, parameters: Sequence, variables: Sequence,
                 solver=None, gp: bool = False, verbose: bool = False,
                 solver_args: Optional[dict] = None, canon_backend=None):
        super().__init__()
        self._layer = _JaxLayer(
            problem, parameters, variables, solver=solver, gp=gp,
            verbose=verbose, solver_args=solver_args,
            canon_backend=canon_backend,
        )
        self._warm: Optional[tuple] = None

    def forward(self, *params, solver_args: Optional[dict] = None,
                warm_start: bool = False, check_status: bool = True):
        """Solve; `warm_start=True` re-feeds the previous call's solution
        as the solver's initial iterate (the reference torch layer's
        warm-start cache, cvxpylayers torch/cvxpylayer.py:375,464-487),
        invalidated automatically on batch-shape change.

        Raises SolverError on infeasible/unbounded/unconverged instances
        (the reference contract: diffcp.SolverError surfaces through the
        torch layer, cvxpylayers tests/test_torch.py:299-316). Pass
        `check_status=False` to skip the device sync + raise, e.g. inside
        torch.compile'd regions where a data-dependent Python raise is
        unwanted."""
        layer = self._layer
        module = self

        ws = None
        if warm_start and self._warm is not None:
            ws = WarmStart(*(jnp.asarray(a) for a in self._warm))

        class _Fn(torch.autograd.Function):
            @staticmethod
            def forward(ctx, *tensors):
                jax_params = tuple(_to_jax(t) for t in tensors)

                batch, _flags = layer._parse_batch(jax_params)
                B = batch or 1
                use_ws = ws if (ws is not None
                                and ws.x.shape[0] == B) else None

                def call(*ps):
                    kw = {"warm_start": use_ws} if use_ws is not None else {}
                    outs, next_ws, status, _ = layer.solve_and_state(
                        *ps, solver_args=solver_args, **kw
                    )
                    return outs, (next_ws, status)

                outs, vjp_fn, (next_ws, status) = jax.vjp(
                    call, *jax_params, has_aux=True
                )
                if check_status:
                    layer._maybe_raise(status)
                if warm_start:
                    module._warm = tuple(
                        np.asarray(a) for a in next_ws
                    )
                ctx._vjp_fn = vjp_fn
                ctx._like = tensors[0]
                return tuple(_to_torch(o, tensors[0]) for o in outs)

            @staticmethod
            @torch.autograd.function.once_differentiable
            def backward(ctx, *grad_outputs):
                cotangents = tuple(
                    jnp.asarray(g.detach().cpu().numpy())
                    for g in grad_outputs
                )
                grads = ctx._vjp_fn(cotangents)
                return tuple(_to_torch(g, ctx._like) for g in grads)

        return _Fn.apply(*params)
