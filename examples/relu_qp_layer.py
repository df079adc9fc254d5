"""ReLU as a QP layer: min ||z - (W x + b)||^2 s.t. z >= 0 has the
closed-form solution z* = relu(W x + b), so a network of such layers is
an MLP whose activations are optimization layers — the reference's
"ReLU Layers" demo (reference examples/torch/ReLU Layers.ipynb).
Here a 2-layer QP-ReLU net is trained on a toy regression task and the
layer is verified against the closed form.
"""

import jax
import jax.numpy as jnp
import numpy as np

import cvxpylayers_tpu as ct


def make_relu_layer(d_in, d_out):
    # W @ x is a parameter-parameter product (not DPP); the DPP-legal
    # form routes W through an equality-pinned variable so each product
    # is parameter x variable (the reference notebook's Wtilde trick)
    z = ct.Variable(d_out)
    Wt = ct.Variable((d_out, d_in))
    W = ct.Parameter((d_out, d_in))
    b = ct.Parameter(d_out)
    x = ct.Parameter(d_in)
    prob = ct.Problem(ct.Minimize(ct.sum_squares(z - Wt @ x - b)),
                      [z >= 0, Wt == W])
    return ct.CvxpyLayer(prob, parameters=[W, b, x], variables=[z])


def main():
    rng = np.random.default_rng(0)
    d_in, d_h, d_out = 4, 8, 1
    relu1 = make_relu_layer(d_in, d_h)

    # closed-form check
    W0 = jnp.asarray(rng.standard_normal((d_h, d_in)))
    b0 = jnp.asarray(rng.standard_normal(d_h))
    x0 = jnp.asarray(rng.standard_normal(d_in))
    (z0,) = relu1(W0, b0, x0)
    err = float(jnp.abs(z0 - jnp.maximum(W0 @ x0 + b0, 0.0)).max())
    print(f"qp-relu vs closed form: max err {err:.2e}")

    # train: 2-layer net, second layer linear
    B = 32
    X = jnp.asarray(rng.standard_normal((B, d_in)))
    t = jnp.sin(X[:, :1]) + 0.5 * jnp.abs(X[:, 1:2])
    params = {
        "W1": jnp.asarray(rng.standard_normal((d_h, d_in)) * 0.3),
        "b1": jnp.zeros(d_h),
        "W2": jnp.asarray(rng.standard_normal((d_out, d_h)) * 0.3),
        "b2": jnp.zeros(d_out),
    }

    @jax.jit
    def loss_fn(p):
        (h,) = relu1(
            jnp.broadcast_to(p["W1"], (B, d_h, d_in)),
            jnp.broadcast_to(p["b1"], (B, d_h)),
            X,
        )
        pred = h @ p["W2"].T + p["b2"]
        return jnp.mean((pred - t) ** 2)

    g = jax.jit(jax.grad(loss_fn))
    for it in range(40):
        grads = g(params)
        params = jax.tree.map(lambda p, gr: p - 0.1 * gr, params, grads)
    print(f"qp-relu net final loss {float(loss_fn(params)):.4f}")


if __name__ == "__main__":
    main()
