"""Data-poisoning attack on logistic regression via implicit gradients.

Fit a regularized logistic regression INSIDE the computation graph
(argmin layer), then compute the gradient of the test loss w.r.t. the
training data itself — the influence-function computation of the
reference's data_poisoning_attack notebook
(/root/reference/examples/torch/data_poisoning_attack.ipynb).
"""

import jax
import jax.numpy as jnp
import numpy as np

import cvxpylayers_tpu as ct


def main():
    rng = np.random.default_rng(0)
    n, N = 2, 20
    # two gaussian blobs
    X_np = np.concatenate([
        rng.standard_normal((N // 2, n)) + 2.0,
        rng.standard_normal((N // 2, n)) - 2.0,
    ])
    y_np = np.concatenate([np.ones(N // 2), np.zeros(N // 2)])
    Xtr, ytr = X_np[::2], y_np[::2]
    Xte, yte = X_np[1::2], y_np[1::2]
    m = Xtr.shape[0]

    a = ct.Variable(n)
    b = ct.Variable(())
    X = ct.Parameter((m, n))
    Y = ytr
    # max likelihood: sum y_i (x_i'a + b) - logistic(x_i'a + b), l2 reg
    ll = (1.0 / m) * ct.sum(
        ct.multiply(ct.Constant(Y), X @ a + b * ct.Constant(np.ones(m)))
        - ct.logistic(X @ a + b * ct.Constant(np.ones(m)))
    )
    reg = -0.1 * ct.sum_squares(a)
    prob = ct.Problem(ct.Maximize(ll + reg))
    fit = ct.CvxpyLayer(prob, parameters=[X], variables=[a, b])

    Xte_j = jnp.asarray(Xte)
    yte_j = jnp.asarray(yte)

    def test_loss(Xtr_):
        a_, b_ = fit(Xtr_)
        logits = Xte_j @ a_ + b_
        return jnp.mean(
            jnp.maximum(logits, 0) - logits * yte_j
            + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )

    Xtr_j = jnp.asarray(Xtr)
    loss0 = float(test_loss(Xtr_j))
    g = jax.grad(test_loss)(Xtr_j)
    # poisoning: ASCEND the test loss by perturbing training points
    X_poisoned = Xtr_j + 0.5 * jnp.sign(g)
    loss1 = float(test_loss(X_poisoned))
    print(f"poisoning attack: test loss {loss0:.4f} -> {loss1:.4f}")
    assert loss1 > loss0


if __name__ == "__main__":
    main()
