"""Benchmark: fwd+bwd solves/sec/chip on a batch-1024 box-QP projection layer
(BASELINE.json primary metric; OptNet-style config 2 shape class).

Runs on whatever accelerator JAX exposes (the driver provides one real TPU
chip via the axon tunnel). Prints ONE JSON line.

vs_baseline: the reference has no published numbers (BASELINE.md); the
denominator is the documented estimate of CPU diffcp fwd+bwd throughput on
QPs of this size (~1e3 solves/s across a desktop CPU's threadpool —
diffcp's threaded solve_and_derivative_batch, reference
interfaces/diffcp_if.py:219-249). Recorded here so the ratio is
reproducible and honest about its provenance.
"""

import json
import time

import numpy as np

CPU_DIFFCP_BASELINE_SOLVES_PER_SEC = 1000.0


def main():
    import jax
    import jax.numpy as jnp

    import cvxpylayers_tpu as ct

    B = 1024
    n, m_ineq = 50, 20

    x = ct.Variable(n)
    v = ct.Parameter(n)
    G = ct.Parameter((m_ineq, n))
    h = ct.Parameter(m_ineq)
    prob = ct.Problem(
        ct.Minimize(ct.sum_squares(x - v)),
        [G @ x <= h, x >= 0, x <= 1],
    )
    layer = ct.CvxpyLayer(prob, parameters=[v, G, h], variables=[x])

    rng = np.random.default_rng(0)
    dtype = jnp.float32
    vv = jnp.asarray(rng.standard_normal((B, n)), dtype)
    Gv = jnp.asarray(rng.standard_normal((B, m_ineq, n)) * 0.3, dtype)
    hv = jnp.asarray(np.abs(rng.standard_normal((B, m_ineq))) + 1.0, dtype)

    # tuned on v5e: ADMM converges by ~75 iters at 1e-3; polish (CG-based
    # Newton in f32) delivers ~1e-7 solution accuracy
    sargs = {
        "eps_abs": 1e-4, "eps_rel": 1e-4,
        "admm_eps_abs": 1e-3, "admm_eps_rel": 1e-3,
        "max_iters": 75, "epoch": 75, "refine_steps": 6,
    }

    def loss(v_, G_, h_):
        (xs,) = layer(v_, G_, h_, solver_args=sargs)
        return jnp.sum(xs**2)

    step = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

    # compile + warm up
    g = step(vv, Gv, hv)
    jax.block_until_ready(g)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        g = step(vv, Gv, hv)
    jax.block_until_ready(g)
    dt = (time.perf_counter() - t0) / iters

    solves_per_sec = B / dt
    print(json.dumps({
        "metric": "fwd+bwd solves/sec/chip (batch-1024 box-QP n=50)",
        "value": round(solves_per_sec, 2),
        "unit": "solves/s",
        "vs_baseline": round(
            solves_per_sec / CPU_DIFFCP_BASELINE_SOLVES_PER_SEC, 3
        ),
    }))


if __name__ == "__main__":
    main()
