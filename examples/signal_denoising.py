"""Total-variation signal denoising with a learned smoothing weight.

The denoiser y* = argmin ||x - y||^2 + lam ||D y||_1 is a layer;
differentiating the reconstruction error w.r.t. lam tunes the smoothing
strength on data — the reference's signal_denoising notebook
(/root/reference/examples/torch/signal_denoising.ipynb), TPU-native.
"""

import jax
import jax.numpy as jnp
import numpy as np

import cvxpylayers_tpu as ct


def main():
    rng = np.random.default_rng(0)
    n = 20
    D = np.diff(np.eye(n), axis=0)  # (n-1, n) first differences

    y = ct.Variable(n)
    x = ct.Parameter(n)
    lam = ct.Parameter((), nonneg=True)
    prob = ct.Problem(
        ct.Minimize(
            ct.sum_squares(y - x) + lam * ct.pnorm(ct.Constant(D) @ y, 1)
        )
    )
    layer = ct.CvxpyLayer(prob, parameters=[x, lam], variables=[y])

    t = np.linspace(0, 2 * np.pi, n)
    clean = jnp.asarray(np.sign(np.sin(2 * t)))  # piecewise-constant
    noisy = clean + 0.3 * jnp.asarray(rng.standard_normal(n))

    def recon_err(lam_):
        (den,) = layer(noisy, lam_)
        return jnp.mean((den - clean) ** 2)

    lam_v = jnp.asarray(0.05)
    e0 = float(recon_err(lam_v))
    for _ in range(8):
        g = jax.grad(recon_err)(lam_v)
        lam_v = jnp.clip(lam_v - 0.05 * g, 0.0, 2.0)
    e1 = float(recon_err(lam_v))
    print(f"denoising: reconstruction mse {e0:.5f} -> {e1:.5f} "
          f"(lam={float(lam_v):.3f})")
    assert e1 <= e0 + 1e-12


if __name__ == "__main__":
    main()
