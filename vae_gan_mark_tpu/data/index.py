"""Annotation indexer + grouped train/val split (reference dataset semantics,
SURVEY.md §2.2).

Index build mirrors ``MarkDatasetAnyBBox.__init__`` (vae-gan.py:216-263, with
the later variants' sorted-deterministic scan, vae-gan-lr-sh.py:268):

  * scan ``json_dir`` for ``*.json``; for each base name try extensions
    .jpg/.png/.jpeg/.webp to find ``{base}_ru{ext}`` in ``ru_image_dir`` and
    ``{base}_en{ext}`` in ``en_image_dir``; the mask is always
    ``{base}_ru.png`` in ``mask_dir`` (vae-gan.py:236);
  * each JSON file holds a list of items; valid items need ``bbox_ru`` as a
    4x[x, y] list and a string ``text``; malformed ``bbox_en`` is nulled
    (vae-gan.py:253-262). One sample per annotation item.

Split mirrors the reference: train_test_split on *unique RU image paths*
(grouped split — all crops of one image land on one side), test fraction 0.1,
seed 42 (vae-gan.py:514-522). sklearn's shuffling is reproduced exactly so
the split matches the reference sample-for-sample on the same data.
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

IMAGE_EXTS = (".jpg", ".png", ".jpeg", ".webp")


@dataclasses.dataclass
class Sample:
    ru_image_path: str
    en_image_path: Optional[str]
    mask_path: Optional[str]
    bbox_ru: List[List[float]]
    bbox_en: Optional[List[List[float]]]
    text: str


def _valid_bbox(b) -> bool:
    return (isinstance(b, list) and len(b) == 4
            and all(isinstance(p, list) and len(p) == 2 for p in b))


def build_index(json_dir: str, ru_image_dir: str, en_image_dir: str,
                mask_dir: str) -> List[Sample]:
    samples: List[Sample] = []
    for fname in sorted(os.listdir(json_dir)):
        if not fname.lower().endswith(".json"):
            continue
        base = Path(fname).stem
        ru_path = en_path = mask_path = None
        for ext in IMAGE_EXTS:
            candidate = os.path.join(ru_image_dir, f"{base}_ru{ext}")
            if os.path.exists(candidate):
                ru_path = candidate
                en_candidate = os.path.join(en_image_dir, f"{base}_en{ext}")
                if os.path.exists(en_candidate):
                    en_path = en_candidate
                mask_candidate = os.path.join(mask_dir, f"{base}_ru.png")
                if os.path.exists(mask_candidate):
                    mask_path = mask_candidate
                break
        if ru_path is None:
            continue
        try:
            with open(os.path.join(json_dir, fname), encoding="utf-8") as f:
                annots = json.load(f)
        except Exception:
            continue
        if not isinstance(annots, list):
            continue
        for item in annots:
            if not isinstance(item, dict):
                continue
            bbox_ru = item.get("bbox_ru")
            bbox_en = item.get("bbox_en")
            text = item.get("text")
            if not _valid_bbox(bbox_ru) or not isinstance(text, str):
                continue
            if bbox_en and not _valid_bbox(bbox_en):
                bbox_en = None
            samples.append(Sample(ru_path, en_path, mask_path,
                                  bbox_ru, bbox_en, text))
    return samples


def grouped_split(samples: Sequence[Sample], val_fraction: float = 0.1,
                  seed: int = 42) -> Tuple[List[int], List[int]]:
    """Split sample indices by unique RU image path (sklearn-equivalent).

    sklearn.model_selection.train_test_split(shuffle=True, random_state=s)
    permutes with ``np.random.RandomState(s).permutation(n)`` and takes the
    first ``ceil(n * test_size)`` as test — reproduced here so the split is
    identical to the reference without depending on sklearn.
    """
    unique = sorted({s.ru_image_path for s in samples})
    n = len(unique)
    if n == 0:
        return list(range(len(samples))), []
    n_val = int(np.ceil(n * val_fraction))
    perm = np.random.RandomState(seed).permutation(n)
    val_imgs = {unique[i] for i in perm[:n_val]}
    train_idx = [i for i, s in enumerate(samples)
                 if s.ru_image_path not in val_imgs]
    val_idx = [i for i, s in enumerate(samples)
               if s.ru_image_path in val_imgs]
    return train_idx, val_idx
