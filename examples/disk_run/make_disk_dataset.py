"""Generate an on-disk dataset in the reference's exact layout, so the full
CLI chain (build_index -> grouped_split -> loader -> train -> checkpoint ->
eval CLI -> serve CLI) can be exercised end-to-end with zero network.

Layout produced (mirrors /root/reference/vae-gan.py:482-601's input dirs):
  json/{base}.json   — list of {bbox_ru, bbox_en, text} annotations
  ru/{base}_ru.png   — "RU creative": source text rendered inside each quad
  en/{base}_en.png   — "EN creative": channel-rotated region + TARGET text
  mask/{base}_ru.png — text-region mask (white inside each bbox_ru quad)

The ru->en mapping inside each region is the same learnable, text-dependent
task as data/synthetic.py (style carry-over + target glyphs), but laid out
in full-size images behind real perspective quads, so the whole decode ->
homography-warp -> train path runs exactly as it would on the Kaggle data.

Usage:
    python examples/disk_run/make_disk_dataset.py --root /tmp/disk_ds \
        [--images 60] [--anns 4] [--seed 0]
"""

from __future__ import annotations

import argparse
import json
import os
import string
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def render_into(img: np.ndarray, text: str, x0: int, y0: int,
                w: int, h: int) -> None:
    """Rasterize ``text`` in white into img[y0:y0+h, x0:x0+w] (in place)."""
    from vae_gan_mark_tpu.data.synthetic import render_text_raster
    g = render_text_raster(text, h, w)[..., None]
    region = img[y0:y0 + h, x0:x0 + w].astype(np.float32)
    img[y0:y0 + h, x0:x0 + w] = (
        region * (1.0 - g) + 255.0 * g).astype(np.uint8)


def jittered_quad(rng, x0, y0, w, h, jitter=6):
    """Axis-aligned rect + small corner jitter: a mild perspective quad
    (clockwise from top-left, the reference's bbox convention)."""
    j = lambda: int(rng.integers(-jitter, jitter + 1))
    return [[x0 + j(), y0 + j()], [x0 + w + j(), y0 + j()],
            [x0 + w + j(), y0 + h + j()], [x0 + j(), y0 + h + j()]]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--images", type=int, default=60)
    ap.add_argument("--anns", type=int, default=4)
    ap.add_argument("--size", default="1280x720")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from PIL import Image
    from vae_gan_mark_tpu.config import get_config

    W, H = (int(v) for v in args.size.split("x"))
    rng = np.random.default_rng(args.seed)
    alphabet = get_config("v2").alphabet
    printable = [c for c in alphabet
                 if c in string.printable and c != " "] or list(alphabet)

    dirs = {k: os.path.join(args.root, k)
            for k in ("json", "ru", "en", "mask")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    region_w, region_h = 448, 64
    cols = max(1, (W - 40) // (region_w + 40))
    rows = max(1, (H - 40) // (region_h + 40))

    for i in range(args.images):
        base = f"img{i:04d}"
        # Smooth-ish background: low-res noise upsampled (more like a real
        # creative than per-pixel noise, and PNG-compresses far smaller).
        small = rng.integers(40, 215, (H // 40, W // 40, 3), np.uint8)
        ru = np.asarray(Image.fromarray(small).resize(
            (W, H), Image.BILINEAR), np.uint8).copy()
        en = ru.copy()
        mask = np.zeros((H, W), np.uint8)

        cells = rng.permutation(rows * cols)[:args.anns]
        anns = []
        for cell in cells:
            r, c = int(cell) // cols, int(cell) % cols
            x0 = 20 + c * (region_w + 40) + int(rng.integers(0, 20))
            y0 = 20 + r * (region_h + 40) + int(rng.integers(0, 20))
            src_text = "".join(rng.choice(printable,
                                          size=int(rng.integers(4, 18))))
            tgt_text = "".join(rng.choice(printable,
                                          size=int(rng.integers(4, 18))))
            quad = jittered_quad(rng, x0, y0, region_w, region_h)
            # RU creative: the source text.
            render_into(ru, src_text, x0, y0, region_w, region_h)
            # EN creative: style carry-over (channel rotation) + target
            # text — depends on the annotation text, so conditioning is
            # learnable AND falsifiable (same task as data/synthetic.py).
            en[y0:y0 + region_h, x0:x0 + region_w] = \
                en[y0:y0 + region_h, x0:x0 + region_w][..., [1, 2, 0]]
            render_into(en, tgt_text, x0, y0, region_w, region_h)
            # Mask: white inside the RU quad.
            xs = np.arange(W)[None, :]
            ys = np.arange(H)[:, None]
            box = ((xs >= x0) & (xs < x0 + region_w)
                   & (ys >= y0) & (ys < y0 + region_h))
            mask[box] = 255
            anns.append({"bbox_ru": quad, "bbox_en": quad,
                         "text": tgt_text})

        Image.fromarray(ru).save(os.path.join(dirs["ru"], base + "_ru.png"))
        Image.fromarray(en).save(os.path.join(dirs["en"], base + "_en.png"))
        Image.fromarray(mask).save(
            os.path.join(dirs["mask"], base + "_ru.png"))
        with open(os.path.join(dirs["json"], base + ".json"), "w") as f:
            json.dump(anns, f)
    print(f"wrote {args.images} images x {args.anns} annotations "
          f"under {args.root}")


if __name__ == "__main__":
    main()
