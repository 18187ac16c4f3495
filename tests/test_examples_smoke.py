"""Smoke tests: every runnable example executes end-to-end at tiny scale.

The examples are the user-facing deployment surface (the counterpart of the
reference's ``if __name__ == "__main__"`` scripts, SURVEY §2.8) — this keeps
them from bit-rotting as the engine evolves. Each runs as a subprocess on
CPU with the smallest flag set that still exercises its full pipeline.
``examples/scaling_run.py`` is covered separately (and more deeply) by
tests/test_multiprocess.py.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (script, tiny-args) — args chosen so a CPU run finishes in seconds while
# still touching every stage of the example's pipeline.
_CASES = [
    ("mppi_diffdrive.py", ["--ticks", "4", "--samples", "128", "--horizon", "10"]),
    ("mppi_racecar_obstacle.py", ["--ticks", "4", "--samples", "128"]),
    ("nmpc_obstacle_avoidance.py", ["--ticks", "4"]),
    ("nmpc_wheel_plant.py", ["--ticks", "4"]),
    (
        "nmpc_fleet_serving.py",
        ["--fleet", "3", "--horizon", "8", "--ticks", "4", "--bench"],
    ),
    (
        "mppi_fleet_serving.py",
        ["--fleet", "3", "--samples", "128", "--horizon", "8", "--ticks", "4", "--bench"],
    ),
    (
        "mppi_fleet_serving.py",
        ["--fleet", "8", "--samples", "64", "--horizon", "6", "--ticks", "3",
         "--sharded"],
    ),
    ("pacer_characterization.py", ["--seconds", "0.5"]),
    ("custom_model_mppi.py", ["--ticks", "3", "--samples", "128", "--horizon", "8"]),
    pytest.param(
        "dnn_mppi.py",
        ["--series", "2", "--epochs", "2", "--samples", "128", "--horizon", "8"],
        marks=pytest.mark.slow,
    ),
    pytest.param(
        "dnn_nmpc_pipeline.py", ["--series", "2", "--epochs", "2"],
        marks=pytest.mark.slow,
    ),
    ("fleet_collection.py", ["--scenarios", "2", "--samples", "64", "--ticks", "5"]),
    pytest.param(
        "nmpc_autotune.py", ["--iters", "3", "--ticks", "6", "--horizon", "5"],
        marks=pytest.mark.slow,
    ),
    pytest.param(
        "ppo_point_goal.py", ["--iters", "2", "--envs", "4"],
        marks=pytest.mark.slow,
    ),
    pytest.param(
        "ppo_pixel_goal.py", ["--iters", "1", "--envs", "2", "--size", "16"],
        marks=pytest.mark.slow,
    ),
    ("realtime_loop.py", ["--hz", "100", "--ticks", "5", "--samples", "128"]),
    ("sharded_mppi.py", ["--ticks", "2", "--samples", "64", "--horizon", "6"]),
]


@pytest.mark.parametrize(
    "script,args", _CASES,
    ids=[getattr(c, "values", c)[0] for c in _CASES],
)
def test_example_runs(script, args, tmp_path, monkeypatch, capsys):
    # In-process via runpy (NOT a subprocess): each subprocess paid ~5 s of
    # fresh jax import before doing any work — 12 examples made this file
    # the single most expensive one in the suite (verdict r3 #9). The
    # examples only read argv/env, so argv-patching in-process is faithful;
    # the conftest already pins the CPU mesh platform for this process.
    # Caveat: the test session runs with jax_enable_x64=True (oracle
    # tolerances), which production `python examples/foo.py` does not —
    # test_example_subprocess_production_config below keeps ONE example
    # running under the real production config as a canary.
    import runpy

    monkeypatch.setenv("MPLBACKEND", "Agg")
    path = os.path.join(REPO, "examples", script)
    cmd = [path] + args
    with open(path) as fh:
        defines_out = 'add_argument("--out"' in fh.read()
    if defines_out:
        cmd += ["--out", str(tmp_path / "out")]
    monkeypatch.setattr(sys, "argv", cmd)
    monkeypatch.chdir(REPO)
    try:
        runpy.run_path(path, run_name="__main__")
    except SystemExit as e:  # argparse --help or explicit exit(0) are fine
        assert not e.code, f"{script} exited with {e.code}"


def test_example_subprocess_production_config(tmp_path):
    """ONE example still runs as a true subprocess with production defaults
    (f32, no x64, fresh interpreter) — the canary for bugs the in-process
    smokes above cannot see because they inherit the test session's
    x64/matmul-precision config."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    env["MPLBACKEND"] = "Agg"
    cmd = [
        sys.executable, os.path.join(REPO, "examples", "mppi_diffdrive.py"),
        "--ticks", "4", "--samples", "128", "--horizon", "10",
        "--out", str(tmp_path / "out"),
    ]
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=600, cwd=REPO, env=env
    )
    assert proc.returncode == 0, (
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-2000:]}"
    )
