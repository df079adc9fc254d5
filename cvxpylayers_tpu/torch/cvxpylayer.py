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

from ..layer.cvxpylayer import CvxpyLayer as _JaxLayer


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

    def forward(self, *params, solver_args: Optional[dict] = None):
        layer = self._layer

        class _Fn(torch.autograd.Function):
            @staticmethod
            def forward(ctx, *tensors):
                jax_params = tuple(_to_jax(t) for t in tensors)

                def call(*ps):
                    return layer(*ps, solver_args=solver_args)

                outs, vjp_fn = jax.vjp(call, *jax_params)
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
