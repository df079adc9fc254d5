"""Multi-device mesh sharding — run in a subprocess with 8 virtual CPU
devices (the flag stalls XLA startup when set globally, and must be set
before backend initialization)."""

import os
import subprocess
import sys
import textwrap

import pytest

_SCRIPT = textwrap.dedent(
    """
    import os
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    import cvxpylayers_tpu as ct
    from cvxpylayers_tpu.parallel import (
        batch_sharding, make_data_mesh, pad_batch, shard_layer_call,
    )

    assert len(jax.devices()) == 8, jax.devices()

    n = 4
    x = ct.Variable(n)
    v = ct.Parameter(n)
    prob = ct.Problem(ct.Minimize(ct.sum_squares(x - v)), [x >= 0])
    layer = ct.CvxpyLayer(prob, parameters=[v], variables=[x])

    mesh = make_data_mesh()
    call = shard_layer_call(layer, mesh)

    B = 16
    rng = np.random.default_rng(0)
    vv = jnp.asarray(rng.standard_normal((B, n)))
    (xs,) = call(vv)
    # sharded result must equal the single-device result
    (xs_ref,) = layer(vv)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xs_ref), atol=1e-9)
    # result really is sharded over the mesh
    assert len(xs.sharding.device_set) == 8, xs.sharding

    # gradient through the sharded call
    g = jax.grad(lambda v_: jnp.sum(call(v_)[0] ** 2))(vv)
    g_ref = jax.grad(lambda v_: jnp.sum(layer(v_)[0] ** 2))(vv)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-8)

    # pad_batch
    (padded,), orig_B = pad_batch((vv[:13],), 8)
    assert padded.shape[0] == 16 and orig_B == 13

    # driver-style dryrun entry
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", r"{entry_path}"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
    print("PARALLEL_OK")
    """
)


@pytest.mark.integration
def test_mesh_sharded_layer():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _SCRIPT.replace(
        "{entry_path}", os.path.join(repo, "__graft_entry__.py")
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    res = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=1200, env=env,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    assert "PARALLEL_OK" in res.stdout
