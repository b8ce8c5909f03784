"""Pre-flight doctor CLI: per-check lines, correct exit codes, and a
killable device probe (the only hang-proof probe shape — see doctor.py)."""

import json
import os
import subprocess
import sys

import pytest

from vae_gan_mark_tpu import doctor


def test_host_checks_pass_without_device(tmp_path, capsys):
    rc = doctor.main(["--skip-device", "--cache-dir", str(tmp_path)])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "[ok] compile-cache" in out
    assert "[ok] native-warp" in out
    assert "[ok] text-embedder" in out


def test_missing_workdir_fails(tmp_path, capsys):
    rc = doctor.main(["--skip-device", "--workdir", str(tmp_path)])
    out = capsys.readouterr().out
    assert rc == 1
    assert "[FAIL] workdir" in out


def test_workdir_with_checkpoint_reports_epoch(tmp_path, capsys):
    ck = tmp_path / "last_checkpoint"
    ck.mkdir()
    (ck / "host_meta.json").write_text(json.dumps({"epoch": 7}))
    rc = doctor.main(["--skip-device", "--workdir", str(tmp_path)])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "epoch 7" in out


def test_device_probe_runs_on_cpu_backend(capsys):
    # The probe child cold-imports jax (~1 min alone on this 1-core host);
    # size the deadline for a loaded box — this asserts the probe *works*,
    # not how fast a contended interpreter starts.
    ok, msg = doctor.check_device(timeout_s=600.0)
    assert ok, msg
    assert "matmul ok" in msg


def test_unresponsive_probe_times_out(monkeypatch):
    # Simulate a wedged backend: the probe child never returns.
    monkeypatch.setattr(doctor, "_PROBE", "import time; time.sleep(60)")
    ok, msg = doctor.check_device(timeout_s=2.0)
    assert not ok and "unresponsive" in msg
