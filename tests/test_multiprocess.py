"""True multi-process (multi-controller) validation on CPU.

Launches examples/scaling_run.py as TWO OS processes with 4 virtual CPU
devices each: jax.distributed.initialize over a localhost coordinator, Gloo
cross-process collectives, and the sample-sharded MPPI step running on an
8-device global mesh that spans both controllers — the exact code path a
TPU pod uses (SURVEY §5.8), one level stronger than the in-process virtual
mesh the rest of the suite exercises.

Regression context (round 2): this path was broken three separate ways —
cluster auto-detection hanging in containers (fixed by
cluster_detection_method="deactivate" in parallel/distributed.py), a
module-level jnp.array in ops/costs.py initializing the backend at import so
jax.distributed.initialize refused, and the scale sweep building meshes from
process-0 devices only.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sharded_mppi(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    args = [
        sys.executable,
        os.path.join(REPO, "examples", "scaling_run.py"),
        "--coordinator", f"localhost:{port}",
        "--num-processes", "2",
        "--k-per-device", "32",
        "--horizon", "5",
        "--chain", "2", "4",
        "--reps", "1",
    ]
    p1 = subprocess.Popen(
        args + ["--process-id", "1"],
        env=env, cwd=REPO,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        p0 = subprocess.run(
            args + ["--process-id", "0"],
            env=env, cwd=REPO, capture_output=True, text=True, timeout=420,
        )
    finally:
        # if p0 died early, p1 blocks forever at the coordinator barrier —
        # kill the exact child we spawned so the failure surfaces instead of
        # a TimeoutExpired from wait() and an orphaned spinner
        try:
            p1.wait(timeout=60)
        except subprocess.TimeoutExpired:
            p1.kill()
            p1.wait(timeout=30)
    assert p0.returncode == 0, p0.stderr[-2000:]
    json_lines = [
        json.loads(l) for l in p0.stdout.splitlines() if l.startswith("{")
    ]
    summary = json_lines[-1]
    assert summary["metric"] == "mppi_weak_scaling_efficiency"
    assert summary["n_hosts"] == 2
    # global mesh spans both controllers: 2 procs x 4 devices
    assert summary["scales"][-1]["devices"] == 8
    assert summary["scales"][-1]["solves_per_s"] > 0
    # every sweep point is a multiple of process_count (mesh must span both)
    assert all(s["devices"] % 2 == 0 for s in summary["scales"])


@pytest.mark.slow
def test_package_import_is_backend_clean():
    """Importing the whole package must NOT initialize an XLA backend:
    jax.distributed.initialize refuses to run after any backend init, so an
    import side effect (e.g. a module-level jnp.array — ops/costs.py had one)
    breaks every multi-controller user. Runs in a subprocess so this test is
    independent of suite import order."""
    code = """
import jax
import dnn_mppi_mpc_tpu
import dnn_mppi_mpc_tpu.solvers, dnn_mppi_mpc_tpu.solvers.cem
import dnn_mppi_mpc_tpu.presets, dnn_mppi_mpc_tpu.paths
import dnn_mppi_mpc_tpu.envs.closed_loop, dnn_mppi_mpc_tpu.envs.sensors
import dnn_mppi_mpc_tpu.train.training, dnn_mppi_mpc_tpu.train.rl
import dnn_mppi_mpc_tpu.parallel.sharding, dnn_mppi_mpc_tpu.parallel.distributed
import dnn_mppi_mpc_tpu.ops.filters, dnn_mppi_mpc_tpu.ops.costs
import dnn_mppi_mpc_tpu.testing.oracle
jax.distributed.initialize("localhost:%d", num_processes=1, process_id=0,
                           cluster_detection_method="deactivate")
print("CLEAN")
""" % _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=180,
    )
    assert out.returncode == 0 and "CLEAN" in out.stdout, out.stderr[-2000:]
