"""Logarithmically-homogeneous self-concordant barriers for the
nonsymmetric cones (Exp, Pow3), used by the interior-point solver.

The reference reaches high-accuracy exp/pow solutions through ECOS /
Clarabel (cvxpylayers docs/guide/solvers.md:9-10); those solvers handle
nonsymmetric cones with barrier-Hessian scalings (Skajaa-Ye / Clarabel's
primal-dual scaling strategy). Here we supply the standard nu=3 barriers
with gradients and Hessians obtained by JAX autodiff of the closed-form
barrier values — exact, branch-free, and f32/f64 polymorphic:

  exp cone  K = cl{(x, y, z): y > 0, y e^{x/y} <= z}
            f(x,y,z) = -log(y log(z/y) - x) - log y - log z

  pow cone  K = {(x, y, z): x^a y^(1-a) >= |z|, x, y >= 0}
            f(x,y,z) = -log(x^{2a} y^{2(1-a)} - z^2)
                       - (1-a) log x - a log y           (Chares 2009)

Both satisfy the log-homogeneity identities H(s) s = -g(s) and
s' g(s) = -nu used by the IPM (solver/ipm.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def exp_barrier(s: jax.Array) -> jax.Array:
    """Barrier value at an interior point of the exp cone (3,)."""
    x, y, z = s[0], s[1], s[2]
    psi = y * jnp.log(z / y) - x
    return -jnp.log(psi) - jnp.log(y) - jnp.log(z)


def pow_barrier(s: jax.Array, alpha) -> jax.Array:
    """Barrier value at an interior point of the power cone (3,)."""
    x, y, z = s[0], s[1], s[2]
    prod = jnp.exp(2.0 * alpha * jnp.log(x) + 2.0 * (1.0 - alpha) * jnp.log(y))
    return (
        -jnp.log(prod - z * z)
        - (1.0 - alpha) * jnp.log(x)
        - alpha * jnp.log(y)
    )


exp_grad = jax.grad(exp_barrier)
exp_hess = jax.hessian(exp_barrier)


def pow_grad(s: jax.Array, alpha) -> jax.Array:
    return jax.grad(pow_barrier)(s, alpha)


def pow_hess(s: jax.Array, alpha) -> jax.Array:
    return jax.hessian(pow_barrier)(s, alpha)


# Interior points used to (re)initialize nonsymmetric blocks. For the exp
# cone the primal and dual cones differ; both points sit safely inside.
EXP_PRIMAL_INTERIOR = (-1.051383, 0.556409, 1.258967)   # Skajaa-Ye init
EXP_DUAL_INTERIOR = (-1.0, 0.0, 2.0)    # -u e^{v/u} = 1 < e*w = 2e
POW_INTERIOR = (1.0, 1.0, 0.0)          # interior of K and K* alike
