"""Multi-device tests: run tests/mesh_check.py in a subprocess with a forced
8-device virtual CPU backend (SURVEY.md §4's prescribed technique), because
the JAX platform is fixed per process and the ambient environment may pin the
real single TPU chip.

The subprocess asserts DP equivalence (pjit data parallelism == single-device
on the same global batch), TP placement equivalence, and the __graft_entry__
multichip dry run.
"""

import os
import subprocess
import sys

def test_mesh_checks_subprocess():
    script = os.path.join(os.path.dirname(__file__), "mesh_check.py")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # The axon sitecustomize (TPU-tunnel PJRT plugin) force-registers the
    # axon platform in every interpreter when PALLAS_AXON_POOL_IPS is set,
    # overriding JAX_PLATFORMS; drop it so the subprocess really runs CPU.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.run(
        [sys.executable, script], env=env, capture_output=True, text=True,
        timeout=1800)
    sys.stdout.write(proc.stdout[-4000:])
    sys.stderr.write(proc.stderr[-4000:])
    assert proc.returncode == 0, "mesh checks failed"
    assert "ALL MESH CHECKS PASSED" in proc.stdout
