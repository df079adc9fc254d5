"""Monotonic output regression: an isotonic-projection layer.

A linear model's raw predictions are projected onto the monotone cone
{y : y_1 <= ... <= y_m} by a differentiable layer
    min ||y - yhat||_2   s.t.  diff(y) >= 0,
and the model is trained end to end through the projection — the
reference's monotonic_output_regression.ipynb workload
(reference examples/torch/monotonic_output_regression.ipynb), with the
projection checked against the pool-adjacent-violators oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np

import cvxpylayers_tpu as ct


def pava(v):
    """Pool-adjacent-violators: the exact isotonic projection oracle."""
    v = np.asarray(v, dtype=float)
    vals = []
    wts = []
    for x in v:
        vals.append(x)
        wts.append(1.0)
        while len(vals) > 1 and vals[-2] > vals[-1]:
            w = wts[-2] + wts[-1]
            m = (wts[-2] * vals[-2] + wts[-1] * vals[-1]) / w
            vals = vals[:-2] + [m]
            wts = wts[:-2] + [w]
    return np.repeat(vals, np.asarray(wts, dtype=int))


def main():
    m = 10
    y = ct.Variable(m)
    yhat = ct.Parameter(m)
    prob = ct.Problem(ct.Minimize(ct.norm(y - yhat, 2)),
                      [ct.diff(y) >= 0])
    layer = ct.CvxpyLayer(prob, parameters=[yhat], variables=[y])

    rng = np.random.default_rng(0)
    raw = rng.standard_normal(m)
    (proj,) = layer(jnp.asarray(raw))
    err = float(np.abs(np.asarray(proj) - pava(raw)).max())
    print(f"isotonic projection vs PAVA oracle: max err {err:.2e}")

    # train a linear model through the projection: features -> monotone y
    n_feat = 6
    W = jnp.asarray(rng.standard_normal((m, n_feat)) * 0.1)
    X = jnp.asarray(rng.standard_normal((16, n_feat)))
    t = jnp.cumsum(jnp.abs(jax.random.normal(jax.random.PRNGKey(1),
                                             (16, m))), axis=1)

    @jax.jit
    def loss_fn(W_):
        preds = X @ W_.T           # (16, m) raw predictions
        (ys,) = layer(preds)       # batched monotone projection
        return jnp.mean((ys - t) ** 2)

    g = jax.jit(jax.grad(loss_fn))
    for it in range(30):
        W = W - 0.2 * g(W)
    print(f"monotonic regression final loss {float(loss_fn(W)):.4f}")


if __name__ == "__main__":
    main()
