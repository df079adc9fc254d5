"""Minimal fake `cvxpy` module for interop-shim coverage (VERDICT r3
#6, mirroring the mlx-stub trick of tests/test_mlx_frontend.py).

cvxpy cannot be installed in this environment (no network), but
`canon/cvxpy_interop.py` is a pure tree-walk over cvxpy's PUBLIC
expression DAG: it dispatches on `type(node).__name__` and reads only
`.args`, `.shape`, `.name()`, `.attributes`, `.p`, `.axis`, `.value`,
`.objective.expr`, `.constraints`, `.dual_variables`. This stub
reproduces exactly that surface — class names match cvxpy's node names
(`AddExpression`, `MulExpression`, `Pnorm`, `Sum`, ...) so the real
dispatch paths execute. It implements NO numerics and NO
canonicalization: the native framework does all of that after
conversion, which is precisely what the shim promises.
"""

import numpy as np


def _wrap(x):
    if isinstance(x, Expression):
        return x
    return Constant(np.asarray(x))


class Expression:
    """Operator-overloading node base; subclasses carry cvxpy node
    names. `args` is the only structural attribute the shim reads."""

    # cvxpy semantics: make numpy defer `ndarray @ expr` (and every
    # other ufunc) to the Expression's reflected operators
    __array_ufunc__ = None
    __array_priority__ = 100

    def __init__(self, args):
        # accept both atom-call style (cp.sum_squares(expr)) and
        # node-list style (AddExpression([a, b]))
        if not isinstance(args, (list, tuple)):
            args = [args]
        self.args = [_wrap(a) for a in args]

    # -- arithmetic (cvxpy operator semantics) --
    def __add__(self, other):
        return AddExpression([self, _wrap(other)])

    def __radd__(self, other):
        return AddExpression([_wrap(other), self])

    def __sub__(self, other):
        return AddExpression([self, NegExpression([_wrap(other)])])

    def __rsub__(self, other):
        return AddExpression([_wrap(other), NegExpression([self])])

    def __neg__(self):
        return NegExpression([self])

    def __matmul__(self, other):
        return MulExpression([self, _wrap(other)])

    def __rmatmul__(self, other):
        return MulExpression([_wrap(other), self])

    def __mul__(self, other):
        # scalar/elementwise multiply (cvxpy emits `multiply`)
        return multiply([_wrap(other), self])

    __rmul__ = __mul__

    def __truediv__(self, other):
        return DivExpression([self, _wrap(other)])

    # -- constraints --
    def __le__(self, other):
        return Inequality(self, _wrap(other))

    def __ge__(self, other):
        return Inequality(_wrap(other), self)

    def __eq__(self, other):  # noqa: PLE0302 — cvxpy semantics
        return Equality(self, _wrap(other))

    __hash__ = object.__hash__

    def __rshift__(self, other):
        # X >> 0 — PSD constraint (cvxpy semantics)
        if isinstance(other, (int, float)) and other == 0:
            return PSD(self)
        return PSD(self - other)

    def __getitem__(self, key):
        # cvxpy emits an `index` node holding the raw key
        return index([self], key)

    @property
    def T(self):
        return transpose([self])


class Leaf(Expression):
    _counter = [0]

    def __init__(self, shape=(), name=None, **attributes):
        super().__init__([])
        self.shape = tuple(shape) if not np.isscalar(shape) else (
            (int(shape),) if shape else ()
        )
        Leaf._counter[0] += 1
        self._name = name or f"{type(self).__name__.lower()}{Leaf._counter[0]}"
        self.attributes = dict(attributes)

    def name(self):
        return self._name


class Variable(Leaf):
    pass


class Parameter(Leaf):
    def __init__(self, shape=(), name=None, **attributes):
        super().__init__(shape, name, **attributes)
        self.value = None


class Constant(Expression):
    def __init__(self, value):
        self.args = []
        # cvxpy Constants may hold scipy.sparse matrices untouched —
        # keep them AS-IS so the shim's densify path executes
        if hasattr(value, "toarray"):
            self.value = value
            self.shape = tuple(value.shape)
        else:
            self.value = np.asarray(value)
            self.shape = self.value.shape


# ---- expression nodes (names MUST match cvxpy's class names: the shim
# dispatches on type(node).__name__) ----


class AddExpression(Expression):
    pass


class NegExpression(Expression):
    pass


class MulExpression(Expression):
    pass


class multiply(Expression):  # noqa: N801 — cvxpy name
    pass


class DivExpression(Expression):
    pass


class transpose(Expression):  # noqa: N801
    pass


class Sum(Expression):
    def __init__(self, args, axis=None):
        super().__init__(args)
        self.axis = axis


class Pnorm(Expression):
    def __init__(self, args, p=2, axis=None):
        super().__init__(args)
        self.p = p
        self.axis = axis


class sum_squares(Expression):  # noqa: N801
    pass


class logistic(Expression):  # noqa: N801
    pass


class entr(Expression):  # noqa: N801
    pass


class abs(Expression):  # noqa: N801,A001 — cvxpy name
    pass


class trace(Expression):  # noqa: N801
    pass


class QuadForm(Expression):
    pass


class power(Expression):  # noqa: N801
    def __init__(self, args, p=1.0):
        super().__init__(args)
        self.p = p


class log_sum_exp(Expression):  # noqa: N801
    def __init__(self, args, axis=None):
        super().__init__(args)
        self.axis = axis


class maximum(Expression):  # noqa: N801
    def __init__(self, *args):
        # cvxpy calls cp.maximum(a, b, ...): variadic atom-call style
        if len(args) == 1:
            args = args[0]
        super().__init__(list(args) if isinstance(args, (list, tuple))
                         else [args])


class minimum(Expression):  # noqa: N801
    def __init__(self, *args):
        if len(args) == 1:
            args = args[0]
        super().__init__(list(args) if isinstance(args, (list, tuple))
                         else [args])


class pos(Expression):  # noqa: N801
    pass


class neg(Expression):  # noqa: N801
    pass


class exp(Expression):  # noqa: N801
    pass


class log(Expression):  # noqa: N801
    pass


class square(Expression):  # noqa: N801
    pass


class Promote(Expression):
    """cvxpy's scalar->shape broadcast node (inserted by its own
    broadcasting rules; constructed explicitly in the stub battery)."""

    def __init__(self, expr, shape):
        super().__init__([expr])
        self.shape = tuple(shape)


class Hstack(Expression):
    def __init__(self, *args):
        if len(args) == 1 and isinstance(args[0], (list, tuple)):
            args = args[0]
        super().__init__(list(args))


class Vstack(Expression):
    def __init__(self, *args):
        if len(args) == 1 and isinstance(args[0], (list, tuple)):
            args = args[0]
        super().__init__(list(args))


class reshape(Expression):  # noqa: N801
    def __init__(self, args, shape):
        super().__init__(args)
        self.shape = tuple(shape)


class index(Expression):  # noqa: N801 — cvxpy name
    """cvxpy's slicing node; the shim reads ``.key`` verbatim."""

    def __init__(self, args, key):
        super().__init__(args)
        self.key = key


class huber(Expression):  # noqa: N801
    def __init__(self, args, M=1.0):
        super().__init__(args)
        self.M = M


class quad_over_lin(Expression):  # noqa: N801
    def __init__(self, x, y):
        super().__init__([x, y])


class norm_inf(Expression):  # noqa: N801
    def __init__(self, args, axis=None):
        super().__init__(args)
        self.axis = axis


# ---- functional aliases (cvxpy's public API constructs the nodes) ----


def sum(expr, axis=None):  # noqa: A001
    return Sum([expr], axis=axis)


def norm(expr, p=2, axis=None):
    # cvxpy builds a dedicated norm_inf node for the infinity norm
    if p in ("inf", float("inf")):
        return norm_inf([expr], axis=axis)
    return Pnorm([expr], p=p, axis=axis)


def quad_form(x, P):
    return QuadForm([x, P])


def hstack(exprs):
    return Hstack(list(exprs))


def vstack(exprs):
    return Vstack(list(exprs))


def scalene(x, alpha, beta):
    # cvxpy's scalene is a composition, not a node class:
    # alpha * pos(x) + beta * neg(x)
    return multiply([Constant(alpha), pos([x])]) + multiply(
        [Constant(beta), neg([x])]
    )


# ---- constraints ----


class _DualVariable:
    """Opaque per-part dual handle (identity is all the shim needs)."""


class Constraint:
    def __init__(self, args, n_duals=1):
        self.args = [_wrap(a) for a in args]
        self.dual_variables = [_DualVariable() for _ in range(n_duals)]
        self.dual_value = None


class Equality(Constraint):
    def __init__(self, lhs, rhs):
        super().__init__([lhs, rhs])


class Inequality(Constraint):
    def __init__(self, lhs, rhs):
        super().__init__([lhs, rhs])


class NonNeg(Constraint):
    def __init__(self, expr):
        super().__init__([expr])


class Zero(Constraint):
    def __init__(self, expr):
        super().__init__([expr])


class SOC(Constraint):
    def __init__(self, t, X):
        super().__init__([t, X], n_duals=2)


class ExpCone(Constraint):
    def __init__(self, x, y, z):
        super().__init__([x, y, z], n_duals=3)


class PSD(Constraint):
    def __init__(self, expr):
        super().__init__([expr])


# ---- problem ----


class Minimize:
    def __init__(self, expr):
        self.expr = _wrap(expr)


class Maximize:
    def __init__(self, expr):
        self.expr = _wrap(expr)


class Problem:
    def __init__(self, objective, constraints=None):
        self.objective = objective
        self.constraints = list(constraints or [])
