"""Multi-process data parallelism: a 2-process x 4-device run must produce
the same training metrics as one process with 8 devices (SURVEY.md §2.12's
"host data sharding per process", exercised the standard way — virtual CPU
devices — since multi-host TPU slices aren't available in CI).

Covers: jax.distributed.initialize plumbing (parallel/distributed.py),
per-process batch slices, make_array_from_process_local_data assembly, and
the cross-process psum the partitioner inserts into the jitted step.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_train_worker.py")


def _clean_env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # axon sitecustomize pins TPU
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # Share the compile cache across ranks and with the rest of the suite.
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    return env


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(nprocs, out_json, port, timeout=1800, mode="steps"):
    env = _clean_env()
    if nprocs == 1:
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(rank), str(nprocs), str(port),
         out_json, mode],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, cwd=REPO) for rank in range(nprocs)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]
    return outs


def test_two_process_dp_equals_single_process(tmp_path):
    out_mp = str(tmp_path / "mp.json")
    out_sp = str(tmp_path / "sp.json")
    _run_workers(2, out_mp, _free_port())
    _run_workers(1, out_sp, _free_port())
    mp = json.load(open(out_mp))
    sp = json.load(open(out_sp))
    assert set(mp) == set(sp)
    for k in sp:
        np.testing.assert_allclose(mp[k], sp[k], rtol=2e-4, atol=1e-5,
                                   err_msg=k)


def test_two_process_trainer_epoch(tmp_path):
    """Full Trainer epoch across 2 processes: batch assembly in _put,
    validation with sharded outputs (triplets from addressable shards),
    process-0 logging, barrier-fenced checkpoint saves."""
    out_mp = str(tmp_path / "mp_trainer.json")
    _run_workers(2, out_mp, _free_port(), mode="trainer")
    result = json.load(open(out_mp))
    assert np.isfinite(result["best_val"])
    assert result["metrics_jsonl_exists"]
    assert result["ckpt_exists"]
