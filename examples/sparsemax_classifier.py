"""A sparsemax output layer inside a small flax-free classifier.

Demonstrates the model zoo + training with optax through the QP layer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cvxpylayers_tpu import models


def main():
    n_classes, n_feat, n_samples = 4, 8, 256
    rng = np.random.default_rng(0)
    W_true = rng.standard_normal((n_feat, n_classes))
    X = rng.standard_normal((n_samples, n_feat))
    y = np.argmax(X @ W_true + 0.1 * rng.standard_normal((n_samples, n_classes)),
                  axis=1)

    layer = models.sparsemax(n_classes)
    W = jnp.zeros((n_feat, n_classes))
    opt = optax.adam(5e-2)
    state = opt.init(W)
    Xj = jnp.asarray(X)
    Y1h = jax.nn.one_hot(jnp.asarray(y), n_classes)

    @jax.jit
    def step(W_, st):
        def loss(W__):
            (probs,) = layer(Xj @ W__)
            return jnp.mean(jnp.sum((probs - Y1h) ** 2, axis=1))

        l, g = jax.value_and_grad(loss)(W_)
        updates, st2 = opt.update(g, st)
        return optax.apply_updates(W_, updates), st2, l

    for it in range(40):
        W, state, l = step(W, state)
        if it % 10 == 0:
            print(f"iter {it:3d}  loss {float(l):.5f}")
    (probs,) = layer(Xj @ W)
    acc = float(jnp.mean(jnp.argmax(probs, axis=1) == jnp.asarray(y)))
    print("train accuracy:", acc)


if __name__ == "__main__":
    main()
