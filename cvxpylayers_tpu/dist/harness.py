"""Scaling measurement harness: solves/s at 1 device, all local
devices, and (multi-process) the whole global mesh.

Run modes
---------
Single process (real TPU host or CPU):

    python -m cvxpylayers_tpu.dist.harness --batch 256

Multi-process CPU simulation on one machine (N processes x K virtual
devices each; the same code path a real multi-host TPU pod runs):

    python -m cvxpylayers_tpu.dist.harness --procs 2 --devices-per-proc 4

The parent self-spawns the workers; worker 0 prints one JSON line with
the measured throughputs (the BASELINE.md scaling metric: iterations/s
at 1 chip / 1 host / N hosts).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np


def _build_problem(n: int):
    import cvxpylayers_tpu as ct

    x = ct.Variable(n)
    v = ct.Parameter(n)
    G = ct.Parameter((n, n))
    prob = ct.Problem(
        ct.Minimize(ct.sum_squares(G @ x - v)), [x >= -1, x <= 1]
    )
    return ct.CvxpyLayer(prob, parameters=[v, G], variables=[x])


def _build_gp_problem():
    """BASELINE config 5: the reference 3-var GP (gp=True log-space
    path) — its multi-host half runs through the same sharded meshes."""
    import cvxpylayers_tpu as ct

    xg = ct.Variable((), pos=True)
    yg = ct.Variable((), pos=True)
    zg = ct.Variable((), pos=True)
    a = ct.Parameter((), pos=True)
    bb = ct.Parameter((), pos=True)
    cc = ct.Parameter(())
    prob = ct.Problem(
        ct.Minimize(1.0 / (xg * yg * zg)),
        [a * (xg * yg + xg * zg + yg * zg) <= bb, xg >= yg ** cc],
    )
    return ct.CvxpyLayer(prob, parameters=[a, bb, cc],
                         variables=[xg, yg, zg], gp=True)


def _gp_throughput(layer, B: int, mesh, steps: int, dtype) -> float:
    """fwd+bwd GP solves/s with the batch sharded over `mesh`."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    from .runtime import global_batch

    rng = np.random.default_rng(0)
    local_devs = set(jax.local_devices())
    is_local = all(d in local_devs for d in mesh.devices.flat)
    Bl = B if is_local else B // jax.process_count()
    a = np.asarray(np.abs(rng.standard_normal(Bl)) + 1.0, dtype)
    bb = np.asarray(np.abs(rng.standard_normal(Bl)) + 3.0, dtype)
    cc = np.asarray(rng.uniform(0.3, 0.9, Bl), dtype)
    if is_local:
        sh = lambda a_: jax.device_put(
            a_, NamedSharding(mesh, PartitionSpec("data"))
        )
        ag, bg, cg = sh(a), sh(bb), sh(cc)
    else:
        ag, bg, cg = (global_batch(v_, mesh) for v_ in (a, bb, cc))
    sargs = {"eps_abs": 1e-4, "eps_rel": 1e-4, "admm_eps_abs": 1e-3,
             "admm_eps_rel": 1e-3, "max_iters": 300, "epoch": 100,
             "cg_iters": 15}

    def loss(a_, b_, c_):
        outs = layer(a_, b_, c_, solver_args=sargs)
        return sum(jnp.mean(o ** 2) for o in outs)

    step = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
    out = step(ag, bg, cg)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = step(ag, bg, cg)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return B * steps / dt


def _throughput(layer, B: int, n: int, mesh, steps: int, dtype) -> float:
    """fwd+bwd solves/s (total across the mesh) with the batch sharded
    over `mesh`. Local meshes (a subset of this process's devices) run
    B instances per process independently; a global mesh splits the
    global batch B across hosts."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    from .runtime import global_batch

    rng = np.random.default_rng(0)
    local_devs = set(jax.local_devices())
    is_local = all(d in local_devs for d in mesh.devices.flat)
    Bl = B if is_local else B // jax.process_count()
    v = np.asarray(rng.standard_normal((Bl, n)), dtype)
    G = np.asarray(
        np.eye(n) + 0.1 * rng.standard_normal((Bl, n, n)), dtype
    )
    if is_local:
        sh = lambda a_: jax.device_put(
            a_, NamedSharding(
                mesh, PartitionSpec("data", *([None] * (a_.ndim - 1)))
            )
        )
        vg, Gg = sh(v), sh(G)
    else:
        vg, Gg = global_batch(v, mesh), global_batch(G, mesh)
    sargs = {"eps_abs": 1e-4, "eps_rel": 1e-4, "admm_eps_abs": 1e-3,
             "admm_eps_rel": 1e-3, "max_iters": 500, "refine_steps": 3}

    def loss(v_, G_):
        (xs,) = layer(v_, G_, solver_args=sargs)
        return jnp.mean(xs ** 2)

    step = jax.jit(jax.value_and_grad(loss, argnums=0))
    out = step(vg, Gg)  # compile + warm
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = step(vg, Gg)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return B * steps / dt


def worker(args) -> None:
    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count="
              f"{args.devices_per_proc}"
        )
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from jax.sharding import Mesh

    from .runtime import initialize, make_global_mesh

    if args.procs > 1:
        initialize(f"localhost:{args.port}", args.procs, args.proc_id)
    dtype = np.float32
    layer = _build_problem(args.n)

    results = {}
    # 1 device
    mesh1 = Mesh(np.array(jax.local_devices()[:1]), ("data",))
    results["solves_per_s_1dev"] = _throughput(
        layer, args.batch, args.n, mesh1, args.steps, dtype
    )
    # all local devices (one host)
    meshL = Mesh(np.array(jax.local_devices()), ("data",))
    results["solves_per_s_1host"] = _throughput(
        layer, args.batch, args.n, meshL, args.steps, dtype
    )
    # global mesh (N hosts)
    if args.procs > 1:
        meshG = make_global_mesh()
        results["solves_per_s_Nhost"] = _throughput(
            layer, args.batch, args.n, meshG, args.steps, dtype
        )
        results["n_hosts"] = jax.process_count()
    if args.sweep_batch:
        # throughput vs batch size (VERDICT r2: a fixed small batch
        # understates accelerator throughput — report the curve)
        sweep = {}
        for B in (64, 256, 1024, 4096):
            sweep[str(B)] = round(
                _throughput(layer, B, args.n, meshL, args.steps, dtype), 1
            )
        results["solves_per_s_1host_by_batch"] = sweep
    if args.gp:
        gp_layer = _build_gp_problem()
        results["gp_solves_per_s_1host"] = _gp_throughput(
            gp_layer, args.gp_batch, meshL, args.steps, dtype
        )
        if args.procs > 1:
            results["gp_solves_per_s_Nhost"] = _gp_throughput(
                gp_layer, args.gp_batch, meshG, args.steps, dtype
            )
    results["n_local_devices"] = len(jax.local_devices())
    if args.proc_id == 0:
        print(json.dumps(results), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=1)
    ap.add_argument("--devices-per-proc", type=int, default=1)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--port", type=int, default=12377)
    ap.add_argument("--gp", action="store_true",
                    help="also measure the gp=True config (BASELINE "
                         "config 5) on the 1-host and N-host meshes")
    ap.add_argument("--gp-batch", type=int, default=1024)
    ap.add_argument("--sweep-batch", action="store_true",
                    help="also sweep batch size 64..4096 on the 1-host "
                         "mesh (throughput-vs-batch curve)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (virtual devices)")
    ap.add_argument("--proc-id", type=int, default=None,
                    help="internal: set for spawned workers")
    args = ap.parse_args()

    if args.procs > 1 and args.proc_id is None:
        # parent: spawn one worker per process and stream worker 0
        procs = []
        for pid in range(args.procs):
            cmd = [sys.executable, "-m", "cvxpylayers_tpu.dist.harness",
                   *sys.argv[1:], "--proc-id", str(pid)]
            procs.append(subprocess.Popen(cmd))
        rc = max(p.wait() for p in procs)
        sys.exit(rc)

    args.proc_id = args.proc_id or 0
    if args.procs > 1:
        args.cpu = True  # multi-process mode here is the CPU simulation
    worker(args)


if __name__ == "__main__":
    main()
