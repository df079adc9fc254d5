"""Docs-as-tests: the README snippet and the examples/ scripts must run
verbatim (reference pattern: tests/test_readme_examples.py)."""

import runpy
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parent.parent


def test_readme_snippet():
    import cvxpylayers_tpu as ct

    n, m = 2, 3
    x = ct.Variable(n)
    A = ct.Parameter((m, n))
    b = ct.Parameter(m)
    problem = ct.Problem(
        ct.Minimize(0.5 * ct.pnorm(A @ x - b, p=1)), [x >= 0]
    )
    assert problem.is_dpp()

    layer = ct.CvxpyLayer(problem, parameters=[A, b], variables=[x])
    key = jax.random.PRNGKey(0)
    kA, kb = jax.random.split(key)
    A_jax = jax.random.normal(kA, (m, n))
    b_jax = jax.random.normal(kb, (m,))
    (solution,) = layer(A_jax, b_jax)
    dA, db = jax.grad(
        lambda A_, b_: layer(A_, b_)[0].sum(), argnums=(0, 1)
    )(A_jax, b_jax)
    assert solution.shape == (n,)
    assert np.all(np.isfinite(np.asarray(dA)))
    assert np.all(np.isfinite(np.asarray(db)))


def test_example_lad_regression(capsys):
    runpy.run_path(str(REPO / "examples" / "lad_regression.py"),
                   run_name="__main__")
    out = capsys.readouterr().out
    assert "final argmin" in out


def test_example_sparsemax_classifier(capsys):
    runpy.run_path(str(REPO / "examples" / "sparsemax_classifier.py"),
                   run_name="__main__")
    out = capsys.readouterr().out
    assert "train accuracy" in out


def test_example_constrained_mpc(capsys):
    runpy.run_path(str(REPO / "examples" / "constrained_mpc.py"),
                   run_name="__main__")
    assert "mpc closed-loop cost" in capsys.readouterr().out


def test_example_optimal_transport(capsys):
    runpy.run_path(str(REPO / "examples" / "optimal_transport.py"),
                   run_name="__main__")
    assert "ot cost" in capsys.readouterr().out


def test_example_data_poisoning(capsys):
    runpy.run_path(str(REPO / "examples" / "data_poisoning.py"),
                   run_name="__main__")
    assert "poisoning attack" in capsys.readouterr().out


def test_example_signal_denoising(capsys):
    runpy.run_path(str(REPO / "examples" / "signal_denoising.py"),
                   run_name="__main__")
    assert "denoising" in capsys.readouterr().out


def test_example_constrained_lqr(capsys):
    runpy.run_path(str(REPO / "examples" / "constrained_lqr.py"),
                   run_name="__main__")
    assert "lqr closed-loop cost" in capsys.readouterr().out


def test_example_monotonic_regression(capsys):
    runpy.run_path(str(REPO / "examples" / "monotonic_regression.py"),
                   run_name="__main__")
    out = capsys.readouterr().out
    assert "PAVA oracle" in out and "final loss" in out


def test_example_relu_qp_layer(capsys):
    runpy.run_path(str(REPO / "examples" / "relu_qp_layer.py"),
                   run_name="__main__")
    out = capsys.readouterr().out
    assert "closed form" in out


def test_example_markowitz_tuning(capsys):
    runpy.run_path(str(REPO / "examples" / "markowitz_tuning.py"),
                   run_name="__main__")
    assert "backtest return" in capsys.readouterr().out


def test_example_resource_allocation(capsys):
    runpy.run_path(str(REPO / "examples" / "resource_allocation.py"),
                   run_name="__main__")
    assert "final fit loss" in capsys.readouterr().out


def test_example_stiffness_tuning(capsys):
    runpy.run_path(str(REPO / "examples" / "stiffness_tuning.py"),
                   run_name="__main__")
    assert "stiffness tuning" in capsys.readouterr().out


def test_example_supply_chain(capsys):
    runpy.run_path(str(REPO / "examples" / "supply_chain.py"),
                   run_name="__main__")
    assert "avg stage cost" in capsys.readouterr().out


def test_example_vehicle_control(capsys):
    runpy.run_path(str(REPO / "examples" / "vehicle_control.py"),
                   run_name="__main__")
    assert "vehicle ADP" in capsys.readouterr().out


def test_example_ot_lp_pdhg(capsys):
    runpy.run_path(str(REPO / "examples" / "ot_lp_pdhg.py"),
                   run_name="__main__")
    out = capsys.readouterr().out
    assert "W2 cost" in out


def test_example_sdp_spectral_layer(capsys):
    runpy.run_path(str(REPO / "examples" / "sdp_spectral_layer.py"),
                   run_name="__main__")
    assert "final alignment" in capsys.readouterr().out
