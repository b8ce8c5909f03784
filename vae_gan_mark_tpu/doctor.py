"""Pre-flight health checks: ``python -m vae_gan_mark_tpu.doctor``.

The reference has no operational tooling at all (its device handling is a
one-line CUDA-else-CPU pick, /root/reference/vae-gan.py:27); on a TPU
fleet, the failure modes that actually take runs down are environmental —
an unresponsive device tunnel, an unwritable compile-cache/checkpoint
path, a serving host missing the SBERT model. ``doctor`` probes each one
and prints a line per check, exiting non-zero if any hard check fails.

The device probe runs in a *subprocess with a deadline*: a wedged PJRT
transport hangs client creation inside a native call that holds the GIL,
so no in-process timeout (thread or signal) can interrupt it — the only
robust probe is a child the parent can kill (same pattern as bench.py's
supervisor and __graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

_PROBE = """
import jax, jax.numpy as jnp
d = jax.devices()
x = jnp.ones((128, 128), jnp.bfloat16)
v = float((x @ x).sum())
print(__import__("json").dumps({
    "platform": d[0].platform,
    "device_kind": getattr(d[0], "device_kind", "?"),
    "n_devices": len(d),
    "matmul_ok": v == 128.0 * 128 * 128,
}))
"""


def check_device(timeout_s: float) -> tuple[bool, str]:
    """Probe the default JAX backend in a killable child."""
    try:
        out = subprocess.run([sys.executable, "-c", _PROBE],
                             capture_output=True, text=True,
                             timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return False, (f"backend unresponsive after {timeout_s:.0f}s "
                       f"(wedged transport? run again later, or set "
                       f"JAX_PLATFORMS=cpu for host-only work)")
    if out.returncode != 0:
        tail = (out.stderr or "").strip().splitlines()[-1:]
        return False, f"probe failed rc={out.returncode}: {tail}"
    try:
        info = json.loads(out.stdout.strip().splitlines()[-1])
    except (ValueError, IndexError):
        return False, f"unparseable probe output: {out.stdout[-200:]!r}"
    ok = bool(info.get("matmul_ok"))
    return ok, (f"{info['platform']} ({info['device_kind']}), "
                f"{info['n_devices']} device(s), matmul "
                f"{'ok' if ok else 'WRONG RESULT'}")


def check_writable(path: str) -> tuple[bool, str]:
    try:
        os.makedirs(path, exist_ok=True)
        with tempfile.NamedTemporaryFile(dir=path):
            pass
        return True, f"writable: {path}"
    except OSError as e:
        return False, f"{path}: {e}"


def check_native_warp() -> tuple[bool, str]:
    from vae_gan_mark_tpu.data import native_warp
    lib = native_warp._load()
    if lib is None:
        return True, ("not built (optional; cv2/PIL host path in use — "
                      "tools/build_native.py builds it)")
    return True, f"loaded: {native_warp._LIB_PATH}"


def check_sbert() -> tuple[bool, str]:
    from vae_gan_mark_tpu.data.text_embed import make_text_embedder
    # Fail fast from the local cache: without this, a host with no route
    # to huggingface.co spends ~1 min in HEAD-request retry loops before
    # the same answer comes back.
    prev = os.environ.get("HF_HUB_OFFLINE")
    os.environ["HF_HUB_OFFLINE"] = "1"
    try:
        make_text_embedder(require_sbert=True)
        return True, "SBERT (MiniLM) available (local cache)"
    except Exception:
        return True, ("SBERT unavailable — sbert-variant serving/eval "
                      "will refuse unless --allow-hash-embed; "
                      "char-token variants (unet/v2/oldv) unaffected")
    finally:
        if prev is None:
            os.environ.pop("HF_HUB_OFFLINE", None)
        else:
            os.environ["HF_HUB_OFFLINE"] = prev


def check_workdir(path: str) -> tuple[bool, str]:
    found = [n for n in ("last_checkpoint", "best_model")
             if os.path.isdir(os.path.join(path, n))]
    if not found:
        return False, f"no checkpoints under {path}"
    meta = os.path.join(path, "last_checkpoint", "host_meta.json")
    note = ""
    if os.path.isfile(meta):
        with open(meta) as f:
            note = f" (epoch {json.load(f).get('epoch', '?')})"
    return True, f"{', '.join(found)}{note}"


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m vae_gan_mark_tpu.doctor",
        description="pre-flight environment health checks")
    p.add_argument("--device-timeout", type=float, default=90.0,
                   help="seconds before the device probe is declared "
                        "unresponsive (first-ever compile on a cold "
                        "remote-compile cache can be slow — raise this)")
    p.add_argument("--skip-device", action="store_true",
                   help="host-only checks (no backend probe)")
    p.add_argument("--workdir", default=None,
                   help="also check this training workdir for checkpoints")
    p.add_argument("--cache-dir", default=None,
                   help="compile-cache dir to check (default: "
                        "JAX_COMPILATION_CACHE_DIR if set)")
    args = p.parse_args(argv)

    checks = []
    if not args.skip_device:
        checks.append(("device", lambda: check_device(args.device_timeout)))
    cache = args.cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if cache:
        checks.append(("compile-cache", lambda: check_writable(cache)))
    checks.append(("native-warp", check_native_warp))
    checks.append(("text-embedder", check_sbert))
    if args.workdir:
        checks.append(("workdir", lambda: check_workdir(args.workdir)))

    failed = 0
    for name, fn in checks:
        try:
            ok, msg = fn()
        except Exception as e:  # a crashing check is a failing check
            ok, msg = False, f"check crashed: {type(e).__name__}: {e}"
        failed += 0 if ok else 1
        print(f"[{'ok' if ok else 'FAIL'}] {name}: {msg}", flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
