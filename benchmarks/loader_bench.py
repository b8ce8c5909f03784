"""Input-pipeline throughput: HostWarpLoader vs DeviceWarpLoader.

Builds a synthetic on-disk dataset (PNG images + JSON annotations in the
reference's layout), then measures batches/sec through both real-data input
paths at the production patch size:

  * host:   PIL decode + cv2/native perspective warp in host worker threads
            (bit-parity with the reference's DataLoader, vae-gan.py:267-288);
  * device: PIL decode + axis-aligned bucket crop on host, batched
            homography solve + bilinear warp + normalize inside one jit on
            the accelerator (data/device_pipeline.py).

Run: python benchmarks/loader_bench.py [--images 24] [--anns 8] [--epochs 3]
Writes benchmarks/loader_bench.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_dataset(root: str, n_images: int, anns_per_image: int,
                 size=(1280, 720)):
    from PIL import Image
    rng = np.random.default_rng(0)
    dirs = {k: os.path.join(root, k) for k in ("json", "ru", "en", "mask")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    w, h = size
    for i in range(n_images):
        base = f"img{i:03d}"
        ru = rng.integers(0, 255, (h, w, 3), np.uint8)
        en = rng.integers(0, 255, (h, w, 3), np.uint8)
        mask = rng.integers(0, 255, (h, w), np.uint8)
        Image.fromarray(ru).save(os.path.join(dirs["ru"], base + "_ru.png"))
        Image.fromarray(en).save(os.path.join(dirs["en"], base + "_en.png"))
        Image.fromarray(mask).save(
            os.path.join(dirs["mask"], base + "_ru.png"))
        anns = []
        for _ in range(anns_per_image):
            x0 = int(rng.integers(0, w - 500))
            y0 = int(rng.integers(0, h - 120))
            quad = [[x0, y0], [x0 + 460, y0 + 6], [x0 + 452, y0 + 80],
                    [x0 - 4, y0 + 72]]
            anns.append({"bbox_ru": quad, "bbox_en": quad, "text": "Sample"})
        with open(os.path.join(dirs["json"], base + ".json"), "w") as f:
            json.dump(anns, f)
    return dirs


def drain(loader, epochs):
    import jax
    n_batches = n_images = 0
    t0 = time.time()
    last = None
    for ep in range(epochs):
        for batch in loader(ep):
            if batch is None:
                continue
            n_batches += 1
            n_images += len(batch["ru"])
            last = batch["ru"]
    # Device loaders return device arrays lazily; force completion.
    if last is not None:
        np.asarray(jax.device_get(last))
    dt = time.time() - t0
    return n_images / dt, n_batches


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=24)
    ap.add_argument("--anns", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "loader_bench.json"))
    args = ap.parse_args()

    from vae_gan_mark_tpu.config import get_config
    from vae_gan_mark_tpu.data.index import build_index
    from vae_gan_mark_tpu.data.pipeline import HostWarpLoader
    from vae_gan_mark_tpu.data.device_pipeline import DeviceWarpLoader

    import jax
    cfg = get_config("v2", batch_size=args.batch)
    # The loaders are host-side work; the backend only matters for the
    # final device_put, but record it so captures are unambiguous.
    out = {"batch": args.batch, "workers": args.workers,
           "epochs": args.epochs,
           "backend": jax.devices()[0].platform}
    with tempfile.TemporaryDirectory() as root:
        dirs = make_dataset(root, args.images, args.anns)
        samples = build_index(dirs["json"], dirs["ru"], dirs["en"],
                              dirs["mask"])
        out["samples"] = len(samples)
        idx = list(range(len(samples)))
        for name, cls in (("host", HostWarpLoader),
                          ("device", DeviceWarpLoader)):
            loader = cls(cfg, samples, idx, batch_size=args.batch,
                         shuffle=False, drop_last=False, seed=0,
                         num_workers=args.workers)
            drain(loader, 1)  # warmup epoch (decode cache, jit compile)
            ips, nb = drain(loader, args.epochs)
            out[name] = {"images_per_sec": round(ips, 2), "batches": nb}
            print(f"[loader-bench] {name}: {ips:.1f} img/s")

        # Persistent decoded-patch cache (data/patch_cache.py): epoch 0
        # decodes+warps once into a uint8 memmap; steady-state epochs
        # stream from it at disk/memory speed. The steady-state number is
        # what a multi-epoch training run actually sees.
        cache_dir = os.path.join(root, "patch_cache")
        loader = HostWarpLoader(cfg, samples, idx, batch_size=args.batch,
                                shuffle=False, drop_last=False, seed=0,
                                num_workers=args.workers,
                                cache_dir=cache_dir)
        t0 = time.time()
        drain(loader, 1)  # cold epoch: pays the one-time decode+warp
        cold_s = time.time() - t0
        ips, nb = drain(loader, args.epochs)
        out["cached"] = {"images_per_sec": round(ips, 2), "batches": nb,
                         "cold_epoch_seconds": round(cold_s, 2)}
        print(f"[loader-bench] cached: {ips:.1f} img/s steady-state "
              f"(cold epoch {cold_s:.1f}s)")
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
