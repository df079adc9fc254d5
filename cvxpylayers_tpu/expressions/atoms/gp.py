"""Atoms that only exist for DGP (log-log / geometric programming):
they are rejected by DCP validation but consumed by the Dgp2Dcp transform
(canon/dgp.py), mirroring the reference's gp=True pipeline
(cvxpylayers utils/parse_args.py:437-453)."""

from __future__ import annotations

import numpy as np

from ..expression import Curvature, Expression, Sign, broadcast_shapes_add
from .base import Atom


class DivExpression(Atom):
    """a / b with a non-constant divisor (monomial division under DGP)."""

    def shape_from_args(self):
        return broadcast_shapes_add(self.args[0].shape, self.args[1].shape)

    def is_atom_convex(self):
        return False

    def is_atom_concave(self):
        return False

    def curvature(self) -> Curvature:
        return Curvature.UNKNOWN  # never DCP; DGP-only

    def sign(self):
        return Sign.mul(self.args[0].sign(), self.args[1].sign())

    def canon(self, ctx, arg_reps):
        raise ValueError(
            "division by a variable or parameter expression is not DCP/DPP; "
            "it is only valid in log-log (gp=True) problems"
        )

    @property
    def value(self):
        va, vb = self.args[0].value, self.args[1].value
        if va is None or vb is None:
            return None
        return va / vb


class PowerParam(Atom):
    """x ** p with a parameter exponent (DGP: p * log x)."""

    def shape_from_args(self):
        if not self.args[1].is_scalar():
            raise ValueError("parameter exponent must be scalar")
        return self.args[0].shape

    def is_atom_convex(self):
        return False

    def is_atom_concave(self):
        return False

    def curvature(self) -> Curvature:
        return Curvature.UNKNOWN  # never DCP; DGP-only

    def sign(self):
        return Sign.NONNEG

    def canon(self, ctx, arg_reps):
        raise ValueError(
            "x ** Parameter is not DCP; it is only valid in log-log "
            "(gp=True) problems"
        )

    @property
    def value(self):
        va, vp = self.args[0].value, self.args[1].value
        if va is None or vp is None:
            return None
        return va ** vp


class LogAddExp(Atom):
    """Elementwise log(e^x + e^y) — the binary posynomial-add image in log
    space. Convex and increasing in both args (DCP-valid)."""

    def shape_from_args(self):
        return broadcast_shapes_add(self.args[0].shape, self.args[1].shape)

    def is_atom_convex(self):
        return True

    def is_atom_concave(self):
        return False

    def is_incr(self, i):
        return True

    def canon(self, ctx, arg_reps):
        from ...canon.tensor_rep import TensorRep
        from .affine import broadcast_map

        reps = []
        for a, r in zip(self.args, arg_reps):
            if a.shape != self.shape:
                r = r.apply_linear(broadcast_map(a.shape, self.shape))
            reps.append(r)
        x, y = reps
        n = x.n_rows
        t_off = ctx.new_aux(n)
        u_off = ctx.new_aux(n)
        v_off = ctx.new_aux(n)
        t = TensorRep.variable(n, t_off)
        u = TensorRep.variable(n, u_off)
        v = TensorRep.variable(n, v_off)
        ones = TensorRep.constant(np.ones(n))
        # e^{x - t} <= u, e^{y - t} <= v, u + v <= 1
        ctx.add_exp(x + t.neg(), ones, u)
        ctx.add_exp(y + t.neg(), ones, v)
        ctx.add_nonneg(ones + u.neg() + v.neg())
        return t
