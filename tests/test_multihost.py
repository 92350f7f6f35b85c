"""2-process CPU multihost training test (VERDICT r2 missing #1).

Spawns two subprocesses that join a jax.distributed group over localhost
(2 local CPU devices each = 4 global devices), run one mesh train step on
per-process batch shards, and checks:
- both processes compute the identical loss and post-step param digest;
- the result equals a single-process run (4 local devices) of the same
  global batch — i.e. per-process data sharding + XLA's compiled gradient
  all-reduce reproduce the reference's DDP semantics
  (accelerate launch + NCCL, reference train.py:163-176).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = Path(__file__).parent / "_multihost_worker.py"
REPO = Path(__file__).parent.parent


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(pid, nproc, port, out, n_local_devices,
           param_sharding="replicated"):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}"
    )
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    # The worker must import point_sam_tpu even when the package is not
    # pip-installed in the environment (fresh boxes run tests straight
    # from the checkout; the parent process gets the path via conftest).
    env["PYTHONPATH"] = str(REPO) + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    return subprocess.Popen(
        [sys.executable, str(WORKER), str(pid), str(nproc), str(port),
         str(out), param_sharding],
        env=env, cwd=str(REPO),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def _run_single_oracle(tmp_path):
    single = tmp_path / "single.json"
    p = _spawn(0, 1, 0, single, n_local_devices=4)
    out, _ = p.communicate(timeout=900)
    assert p.returncode == 0, out[-4000:]
    return json.loads(single.read_text())


def _run_pair(tmp_path, param_sharding):
    port = _free_port()
    outs = [tmp_path / f"{param_sharding}_p{i}.json" for i in range(2)]
    procs = [_spawn(i, 2, port, outs[i], n_local_devices=2,
                    param_sharding=param_sharding) for i in range(2)]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        logs.append(out)
    assert all(p.returncode == 0 for p in procs), "\n".join(
        log[-4000:] for log in logs)
    return [json.loads(o.read_text()) for o in outs]


@pytest.fixture(scope="module")
def single_oracle(tmp_path_factory):
    """Single-process (4 local devices) DP oracle, shared by both tests."""
    return _run_single_oracle(tmp_path_factory.mktemp("oracle"))


@pytest.mark.slow
def test_two_process_step_matches_single_process(tmp_path, single_oracle):
    r0, r1 = _run_pair(tmp_path, "replicated")
    rs = single_oracle

    # Both processes see the same compiled step over the same global arrays.
    assert r0["loss"] == pytest.approx(r1["loss"], abs=1e-6)
    assert r0["digest"] == pytest.approx(r1["digest"], rel=1e-7)
    # And the 2-process run reproduces the single-process computation.
    assert r0["loss"] == pytest.approx(rs["loss"], abs=5e-5)
    assert r0["digest"] == pytest.approx(rs["digest"], rel=1e-6)


@pytest.mark.slow
def test_two_process_fsdp_matches_dp(tmp_path, single_oracle):
    """VERDICT r3 #9: 2-process FSDP (params + optimizer state sharded over
    the data axis — the layout giant training actually uses) must produce
    the same loss and post-step params as replicated DP."""
    r0, r1 = _run_pair(tmp_path, "fsdp")
    rs = single_oracle

    assert r0["loss"] == pytest.approx(r1["loss"], abs=1e-6)
    assert r0["digest"] == pytest.approx(r1["digest"], rel=1e-6)
    # FSDP reduce-scatter/all-gather ordering differs from DP's all-reduce,
    # so allow a slightly looser fp32 tolerance than the DP-vs-DP check.
    assert r0["loss"] == pytest.approx(rs["loss"], abs=5e-5)
    assert r0["digest"] == pytest.approx(rs["digest"], rel=1e-5)
