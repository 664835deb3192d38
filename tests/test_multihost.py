"""Multi-host execution paths on a real 2-process jax.distributed rendezvous.

Spawns two localhost CPU processes (2 virtual devices each -> a 4-device
global mesh) running tests/multihost_worker.py. This covers the code that is
structurally dead in single-process tests: init_distributed env:// detection,
host-sharded loaders, host_local->global batch construction, the DP train
step over a cross-process mesh, result/metric gathering and the barrier
(reference util/dist.py:25-113, 201-238).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(script: str, extra_env=None, timeout: int = 300):
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", script)
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update({
            # env:// rendezvous variables (reference util/dist.py:203-206)
            "RANK": str(rank),
            "WORLD_SIZE": "2",
            "MASTER_ADDR": "localhost",
            "MASTER_PORT": str(port),
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "PYTHONPATH": repo + os.pathsep + env.get("PYTHONPATH", ""),
        })
        env.update(extra_env or {})
        procs.append(subprocess.Popen(
            [sys.executable, worker], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
    results = {}
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert lines, f"no RESULT line in:\n{out}"
        r = json.loads(lines[-1][len("RESULT "):])
        results[r["pid"]] = r
    assert set(results) == {0, 1}
    return results


@pytest.fixture(scope="module")
def worker_results():
    return _run_workers("multihost_worker.py")


def test_loader_shards_are_disjoint_and_complete(worker_results):
    seen0 = worker_results[0]["seen"]
    seen1 = worker_results[1]["seen"]
    assert len(seen0) == len(seen1) == 4
    assert sorted(seen0 + seen1) == list(range(8))


def test_dp_train_step_matches_single_process(worker_results):
    # recompute the global-batch step locally: loss and the SGD update must
    # match what both hosts computed through the cross-process mesh
    w0 = (np.arange(3, dtype=np.float32).reshape(3, 1) + 1) / 10
    xs = np.arange(24, dtype=np.float32).reshape(8, 3) / 10
    ys = np.ones((8, 1), np.float32)
    pred = xs @ w0
    expected_loss = float(np.mean((pred - ys) ** 2))
    grad = 2.0 * xs.T @ (pred - ys) / pred.size
    expected_w = (w0 - 0.1 * grad).reshape(-1)

    for pid in (0, 1):
        r = worker_results[pid]
        np.testing.assert_allclose(r["loss"], expected_loss, rtol=1e-5)
        np.testing.assert_allclose(r["w"], expected_w, rtol=1e-5)
    # both hosts hold the identical replicated state
    np.testing.assert_array_equal(worker_results[0]["w"], worker_results[1]["w"])
    # grad_accum=2 across 2 processes: identical update to the full batch
    for r in worker_results.values():
        np.testing.assert_allclose(r["ga_w"], expected_w, rtol=1e-5)


def test_host_gather_and_metric_sync(worker_results):
    for pid in (0, 1):
        r = worker_results[pid]
        # host_gather_results merged both hosts' 3-entry dicts (dist.py:25-86)
        assert r["gathered"] == sorted(
            [f"q{h}_{k}" for h in (0, 1) for k in range(3)])
        # reduce_dict average of {0.0, 1.0} (dist.py:89-113)
        assert r["reduced"] == 0.5
        # SmoothedValue all_reduce of [count, total]: (1+2)/2
        assert r["sv_avg"] == 1.5
    assert worker_results[0]["main"] is True
    assert worker_results[1]["main"] is False


def test_tp_params_span_processes():
    """Model-parallel GPT-J train step with the model axis (size 4) crossing
    the process boundary: shard_params places head/ffn shards on
    non-addressable devices, and the step's loss + update must equal a
    single-device replicated run (VERDICT r2 #8)."""
    results = _run_workers("multihost_tp_worker.py", {"LEG": "tp"},
                           timeout=600)
    for pid in (0, 1):
        r = results[pid]
        assert r["tp_sharded_leaves"] > 0
        np.testing.assert_allclose(r["tp_loss"], r["tp_ref_loss"], rtol=2e-4)
        assert r["tp_update_l2_delta"] < 1e-3, r["tp_update_l2_delta"]
    np.testing.assert_allclose(results[0]["tp_loss"], results[1]["tp_loss"])


def test_fsdp_params_span_processes():
    """FSDP-storage DeBERTa train step with the data axis (size 4) crossing
    the process boundary: param/opt shards live on non-addressable devices
    and GSPMD all-gathers them inside the step; loss + update must equal a
    replicated single-device run over the same global batch."""
    results = _run_workers("multihost_tp_worker.py", {"LEG": "fsdp"},
                           timeout=600)
    for pid in (0, 1):
        r = results[pid]
        assert r["fsdp_sharded_leaves"] > 0
        np.testing.assert_allclose(r["fsdp_loss"], r["fsdp_ref_loss"],
                                   rtol=2e-4)
        assert r["fsdp_update_l2_delta"] < 1e-3, r["fsdp_update_l2_delta"]
    np.testing.assert_allclose(results[0]["fsdp_loss"], results[1]["fsdp_loss"])
