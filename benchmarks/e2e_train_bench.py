"""End-to-end training throughput: disk -> cached loader -> prefetch -> step.

VERDICT r03 #6 asked for the *end-to-end* train images/sec — the real input
pipeline (on-disk PNGs + JSON annotations in the reference's layout,
vae-gan.py:216-263) feeding the real jitted v2 train step through the
Trainer's double-buffered prefetch — not just the isolated step (bench.py)
or the isolated loader (loader_bench.py).

Builds a synthetic on-disk dataset, then runs the actual CLI trainer
(`python -m vae_gan_mark_tpu.train`) with `--loader host --patch-cache`
for a few epochs and reports the per-epoch `train/images_per_sec` the
Trainer itself measures (train/loop.py:260). Epoch 1 pays the one-time
decode+warp into the patch cache; later epochs are the steady state a
multi-epoch training run actually sees.

Run: python benchmarks/e2e_train_bench.py [--batch 128] [--epochs 3]
Writes benchmarks/e2e_train_bench_r04.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

# Repo root (for the package) AND this bench dir (for loader_bench) — the
# implicit sys.path[0] only covers the latter when invoked as
# `python benchmarks/e2e_train_bench.py` (advisor r04).
_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, ".."))
sys.path.insert(0, _HERE)

from loader_bench import make_dataset  # noqa: E402  (same bench dir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=48)
    ap.add_argument("--anns", type=int, default=32)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "e2e_train_bench_r05.json"))
    args = ap.parse_args()

    import jax
    backend = jax.devices()[0].platform

    with tempfile.TemporaryDirectory() as root:
        t0 = time.time()
        dirs = make_dataset(root, args.images, args.anns)
        gen_s = time.time() - t0
        print(f"[e2e] dataset on disk: {args.images} images x {args.anns} "
              f"anns in {gen_s:.1f}s", flush=True)
        workdir = os.path.join(root, "run")
        cache = os.path.join(root, "patch_cache")
        cmd = [
            sys.executable, "-m", "vae_gan_mark_tpu.train",
            "--variant", "v2",
            "--json-dir", dirs["json"], "--ru-dir", dirs["ru"],
            "--en-dir", dirs["en"], "--mask-dir", dirs["mask"],
            "--batch-size", str(args.batch),
            "--epochs", str(args.epochs),
            "--loader", "host", "--patch-cache", cache,
            "--num-workers", str(args.workers),
            "--workdir", workdir, "--seed", "0",
        ]
        t0 = time.time()
        proc = subprocess.run(cmd, cwd=os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".."),
            capture_output=True, text=True, timeout=1500)
        train_s = time.time() - t0
        if proc.returncode != 0:
            print(proc.stdout[-4000:])
            print(proc.stderr[-4000:])
            raise SystemExit(f"trainer rc={proc.returncode}")

        metrics_path = os.path.join(workdir, "v2.metrics.jsonl")
        epochs = []
        with open(metrics_path) as f:
            for line in f:
                row = json.loads(line)
                if "train/images_per_sec" in row:
                    epochs.append({
                        "epoch": row.get("epoch"),
                        "images_per_sec": round(
                            row["train/images_per_sec"], 2),
                    })
        if not epochs or epochs[-1]["images_per_sec"] <= 0.0:
            # drop_last=True at a large batch with few samples can yield
            # zero train batches — that must not read as a measurement.
            raise SystemExit(
                f"no usable epochs in {metrics_path}: {epochs} "
                f"(images={args.images} x anns={args.anns} too small for "
                f"batch {args.batch}?)")
        steady = epochs[-1]["images_per_sec"]

        # Comparator: the latest committed isolated-step capture, read at
        # run time so it cannot drift from the bench artifacts (advisor
        # r04); falls back to None if the driver artifact is absent.
        isolated = None
        for name in sorted(os.listdir(os.path.join(_HERE, ".."))):
            if name.startswith("BENCH_r") and name.endswith(".json"):
                try:
                    with open(os.path.join(_HERE, "..", name)) as f:
                        isolated = json.load(f)["parsed"]["value"]
                except Exception:
                    pass
        out = {
            "what": "end-to-end train throughput: on-disk dataset -> "
                    "host loader (+patch cache) -> prefetch -> jitted v2 "
                    "train step (Trainer-measured train/images_per_sec)",
            "backend": backend,
            "batch": args.batch,
            "workers": args.workers,
            "per_epoch": epochs,
            "cold_epoch_images_per_sec": epochs[0]["images_per_sec"],
            "steady_state_images_per_sec": steady,
            "isolated_step_images_per_sec_latest_committed": isolated,
            "wall_seconds": round(train_s, 1),
        }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
