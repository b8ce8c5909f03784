"""bench.py's deadline supervisor: the driver-facing entry must emit one
JSON line no matter what the device backend does.

A wedged axon tunnel hangs PJRT client creation inside a GIL-holding
native call (no watchdog thread or signal handler can run), so bench.py
runs the real bench in a child process and the parent owns the deadline.
These tests drive the parent against stub children — no jax, no device.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run_parent(tmp_path, child_body: str, deadline: str = "5"):
    """Run bench.py's supervisor with BENCH_CHILD redirected to a stub.

    The parent spawns `sys.executable bench.py` with BENCH_CHILD=1; we
    substitute a stub interpreter (a wrapper script) via a tiny launcher
    that execs the stub instead of the real child path.
    """
    stub = tmp_path / "stub_child.py"
    stub.write_text(child_body)
    # A fake "python" that ignores its argv and runs the stub: bench.py
    # invokes [sys.executable, bench.py], so wrap the real interpreter.
    fake_py = tmp_path / "fakepy"
    fake_py.write_text(
        f"#!/bin/sh\nexec {sys.executable} {stub} \"$@\"\n")
    fake_py.chmod(0o755)
    code = (
        "import sys; sys.executable = %r; "
        "sys.argv = ['bench.py']; "
        "g = {'__name__': '__main__', '__file__': %r}; "
        "exec(open(%r).read(), g)" % (str(fake_py), BENCH, BENCH))
    env = dict(os.environ, BENCH_DEADLINE_S=deadline)
    env.pop("BENCH_CHILD", None)
    return subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True, env=env,
                          timeout=60)


def test_success_reemits_final_json_line(tmp_path):
    out = _run_parent(tmp_path, (
        "import sys\n"
        "print('progress noise')\n"
        "print('{\"metric\": \"m\", \"value\": 42.0, "
        "\"unit\": \"images/sec\", \"vs_baseline\": 2.0}')\n"))
    assert out.returncode == 0, out.stderr
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, lines
    d = json.loads(lines[0])
    assert d["value"] == 42.0 and "error" not in d


def test_hung_child_yields_error_json_within_deadline(tmp_path):
    out = _run_parent(tmp_path,
                      "import time\ntime.sleep(600)\n", deadline="3")
    assert out.returncode == 0, out.stderr
    d = json.loads(out.stdout.strip().splitlines()[-1])
    assert d["value"] is None and "deadline" in d["error"]


def test_crashed_child_yields_error_json(tmp_path):
    out = _run_parent(tmp_path, "import sys\nsys.exit(7)\n")
    assert out.returncode == 0, out.stderr
    d = json.loads(out.stdout.strip().splitlines()[-1])
    assert d["value"] is None and "rc=7" in d["error"]


def test_child_env_flag_reaches_child(tmp_path):
    out = _run_parent(tmp_path, (
        "import os, json\n"
        "print(json.dumps({'metric': 'env', "
        "'value': float(os.environ.get('BENCH_CHILD') == '1'), "
        "'unit': 'flag', 'vs_baseline': 0.0}))\n"))
    assert out.returncode == 0, out.stderr
    d = json.loads(out.stdout.strip().splitlines()[-1])
    assert d["value"] == 1.0, "child must see BENCH_CHILD=1"
