"""Tuning a Markowitz trading policy by differentiating a backtest.

The policy is an optimization layer (reference
examples/torch/markowitz_tuning.ipynb workload): given current holdings
h, covariance square root C and forecast mu, trade u so the post-trade
portfolio h+ = h + u maximizes
    mu' h+  -  ||C h+||^2
subject to self-financing with transaction and shorting costs:
    sum(u) + kappa' |u| + short' neg(h+)  <=  0.
The tuned parameter is a return-forecast scale applied to mu; the
backtest return over a rollout is differentiated straight through the
sequence of solves.
"""

import jax
import jax.numpy as jnp
import numpy as np

import cvxpylayers_tpu as ct

N = 6          # assets
KAPPA = 5e-3   # transaction cost
SHORT = 1e-2   # shorting cost


def make_policy():
    h = ct.Parameter(N)
    C = ct.Parameter((N, N))
    mu = ct.Parameter(N)
    u = ct.Variable(N)
    hp = ct.Variable(N)
    risk = ct.sum_squares(C @ hp)
    cost = KAPPA * ct.sum(ct.abs(u)) + SHORT * ct.sum(ct.neg(hp))
    prob = ct.Problem(
        ct.Maximize(mu @ hp - risk),
        [ct.sum(u) + cost <= 0, hp == h + u],
    )
    return ct.CvxpyLayer(prob, parameters=[h, C, mu], variables=[u, hp])


def main():
    rng = np.random.default_rng(0)
    policy = make_policy()

    T = 8
    C = jnp.asarray(np.diag(rng.uniform(0.5, 1.5, N)) * 0.4)
    mus = jnp.asarray(rng.standard_normal((T, N)) * 0.05 + 0.02)
    rets = mus + 0.02 * jnp.asarray(rng.standard_normal((T, N)))
    h0 = jnp.ones(N) / N

    def backtest(scale):
        def step(h, xs):
            mu_t, r_t = xs
            _, hp = policy(h, C, scale * mu_t)
            wealth_gain = hp @ r_t
            return hp, wealth_gain

        _, gains = jax.lax.scan(step, h0, (mus, rets))
        return -jnp.sum(gains)  # negative cumulative return

    loss = jax.jit(backtest)
    g = jax.jit(jax.grad(backtest))
    scale = jnp.asarray(1.0)
    for it in range(15):
        scale = scale - 2.0 * g(scale)
    print(f"markowitz tuning: scale {float(scale):.3f}, "
          f"backtest return {-float(loss(scale)):.4f}")


if __name__ == "__main__":
    main()
