"""Data layer tests: indexer semantics, grouped split vs sklearn, tokenizer,
host loader with reference-style fallbacks."""

import json
import os

import numpy as np
import pytest

from vae_gan_mark_tpu.config import get_config
from vae_gan_mark_tpu.data.index import build_index, grouped_split
from vae_gan_mark_tpu.data.pipeline import HostWarpLoader, load_sample
from vae_gan_mark_tpu.data.tokenizer import CharTokenizer

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def make_dataset(root, n_images=6, annots_per_image=3, missing_en=False):
    dirs = {k: os.path.join(root, k) for k in ("json", "ru", "en", "mask")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n_images):
        base = f"img{i:03d}"
        w, h = 320, 240
        ru = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(ru).save(os.path.join(dirs["ru"], f"{base}_ru.jpg"))
        if not (missing_en and i == 0):
            Image.fromarray(255 - ru).save(
                os.path.join(dirs["en"], f"{base}_en.jpg"))
        mask = np.zeros((h, w), np.uint8)
        mask[50:150, 50:250] = 255
        Image.fromarray(mask).save(
            os.path.join(dirs["mask"], f"{base}_ru.png"))
        annots = []
        for j in range(annots_per_image):
            x0, y0 = 20 + 10 * j, 30 + 5 * j
            annots.append({
                "bbox_ru": [[x0, y0], [x0 + 100, y0], [x0 + 100, y0 + 40],
                            [x0, y0 + 40]],
                "bbox_en": [[x0, y0], [x0 + 90, y0], [x0 + 90, y0 + 35],
                            [x0, y0 + 35]],
                "text": f"sample text {i}-{j}",
            })
        # One malformed item (skipped) and one with bad bbox_en (nulled).
        annots.append({"bbox_ru": [[0, 0]], "text": "bad"})
        annots.append({
            "bbox_ru": [[5, 5], [60, 5], [60, 30], [5, 30]],
            "bbox_en": "garbage", "text": "null en bbox"})
        with open(os.path.join(dirs["json"], f"{base}.json"), "w") as f:
            json.dump(annots, f)
    return dirs


class TestIndexer:
    def test_index_build(self, tmp_path):
        dirs = make_dataset(str(tmp_path))
        samples = build_index(dirs["json"], dirs["ru"], dirs["en"],
                              dirs["mask"])
        # 3 valid + 1 nulled-bbox_en per image; malformed bbox_ru skipped.
        assert len(samples) == 6 * 4
        nulled = [s for s in samples if s.bbox_en is None]
        assert len(nulled) == 6
        assert all(s.mask_path and s.mask_path.endswith("_ru.png")
                   for s in samples)

    def test_missing_en_image_allowed(self, tmp_path):
        dirs = make_dataset(str(tmp_path), missing_en=True)
        samples = build_index(dirs["json"], dirs["ru"], dirs["en"],
                              dirs["mask"])
        missing = [s for s in samples if s.en_image_path is None]
        assert len(missing) == 4  # all samples of image 0


class TestGroupedSplit:
    def test_matches_sklearn(self, tmp_path):
        sklearn = pytest.importorskip("sklearn.model_selection")
        dirs = make_dataset(str(tmp_path), n_images=10)
        samples = build_index(dirs["json"], dirs["ru"], dirs["en"],
                              dirs["mask"])
        train_idx, val_idx = grouped_split(samples, 0.1, seed=42)
        unique = sorted({s.ru_image_path for s in samples})
        tr, va = sklearn.train_test_split(unique, test_size=0.1,
                                          random_state=42)
        val_set = set(va)
        expected_val = [i for i, s in enumerate(samples)
                        if s.ru_image_path in val_set]
        assert val_idx == expected_val
        assert set(train_idx) | set(val_idx) == set(range(len(samples)))
        # Grouped: no image appears on both sides.
        tr_imgs = {samples[i].ru_image_path for i in train_idx}
        va_imgs = {samples[i].ru_image_path for i in val_idx}
        assert not (tr_imgs & va_imgs)


class TestTokenizer:
    def test_reference_semantics(self):
        tok = CharTokenizer("abc", max_len=5)
        out = tok.encode(["abcab", "zzz", "a", ""])
        np.testing.assert_array_equal(
            out, [[1, 2, 3, 1, 2],
                  [0, 0, 0, 0, 0],   # OOV -> PAD
                  [1, 0, 0, 0, 0],
                  [0, 0, 0, 0, 0]])
        assert tok.encode(["abcabcabc"]).shape == (1, 5)  # truncation

    def test_full_alphabet_roundtrip(self):
        cfg = get_config("v2")
        tok = CharTokenizer(cfg.alphabet, cfg.max_text_len)
        text = "Hello, World! 42"
        assert tok.decode(tok.encode([text])[0]) == text


class TestHostLoader:
    def test_batches(self, tmp_path):
        dirs = make_dataset(str(tmp_path))
        cfg = get_config("v2", patch_h=32, patch_w=64,
                         compute_dtype="float32", batch_size=4,
                         max_text_len=12)
        samples = build_index(dirs["json"], dirs["ru"], dirs["en"],
                              dirs["mask"])
        loader = HostWarpLoader(cfg, samples, list(range(len(samples))),
                                batch_size=4, shuffle=True, drop_last=True,
                                num_workers=2)
        batches = list(loader(0))
        assert len(batches) == len(samples) // 4
        b = batches[0]
        assert b["ru"].shape == (4, 32, 64, 3)
        assert b["en"].shape == (4, 32, 64, 3)
        assert b["mask"].shape == (4, 32, 64, 1)
        assert b["text"].shape == (4, 12) and b["text"].dtype == np.int32
        assert 0.0 <= b["ru"].min() and b["ru"].max() <= 1.0
        # Shuffle differs across epochs, deterministic per (seed, epoch).
        b2 = next(iter(loader(1)))
        assert not np.array_equal(b["ru"], b2["ru"])
        b0_again = next(iter(loader(0)))
        np.testing.assert_array_equal(b["ru"], b0_again["ru"])

    def test_dummy_fallback_on_broken_sample(self, tmp_path):
        dirs = make_dataset(str(tmp_path), n_images=1)
        samples = build_index(dirs["json"], dirs["ru"], dirs["en"],
                              dirs["mask"])
        sample = samples[0]
        sample.ru_image_path = "/nonexistent.jpg"
        cfg = get_config("v2", patch_h=32, patch_w=64,
                         compute_dtype="float32", max_text_len=12)
        ru, en, mask, text = load_sample(sample, cfg)
        assert ru.shape == (32, 64, 3) and not ru.any()
        assert text == ""

    def test_sbert_text_embedding(self, tmp_path):
        dirs = make_dataset(str(tmp_path), n_images=2)
        cfg = get_config("vanilla", patch_h=32, patch_w=64,
                         compute_dtype="float32", batch_size=4)
        samples = build_index(dirs["json"], dirs["ru"], dirs["en"],
                              dirs["mask"])
        loader = HostWarpLoader(cfg, samples, list(range(len(samples))),
                                batch_size=4, num_workers=2)
        b = next(iter(loader(0)))
        assert b["text"].shape == (4, cfg.sbert_dim)
        assert b["text"].dtype == np.float32


class TestNativeWarp:
    def test_native_matches_cv2(self):
        cv2 = pytest.importorskip("cv2")
        from vae_gan_mark_tpu.data import native_warp as nw
        if not nw.available():
            pytest.skip("native lib not built and no g++")
        rng = np.random.default_rng(7)
        img = cv2.GaussianBlur(
            rng.integers(0, 256, (240, 320, 3), dtype=np.uint8), (5, 5), 2.0)
        quad = np.array([[50, 60], [200, 58], [198, 150], [48, 148]],
                        np.float32)
        dst = np.array([[0, 0], [447, 0], [447, 63], [0, 63]], np.float32)
        m = cv2.getPerspectiveTransform(quad, dst)
        golden = cv2.warpPerspective(img, m, (448, 64),
                                     flags=cv2.INTER_LINEAR,
                                     borderMode=cv2.BORDER_REPLICATE)
        ours = nw.perspective_crop(img, quad, 448, 64)
        diff = np.abs(ours.astype(np.float32) - golden.astype(np.float32))
        assert diff.mean() < 0.05 and diff.max() <= 2.0

    def test_loader_with_forced_native(self, tmp_path, monkeypatch):
        from vae_gan_mark_tpu.data import native_warp as nw
        if not nw.available():
            pytest.skip("native lib not built")
        from vae_gan_mark_tpu.data import pipeline as pl
        monkeypatch.setattr(pl, "_FORCE_NATIVE", True)
        dirs = make_dataset(str(tmp_path), n_images=1)
        cfg = get_config("v2", patch_h=32, patch_w=64,
                         compute_dtype="float32", batch_size=4,
                         max_text_len=12)
        from vae_gan_mark_tpu.data.index import build_index
        samples = build_index(dirs["json"], dirs["ru"], dirs["en"],
                              dirs["mask"])
        loader = pl.HostWarpLoader(cfg, samples, list(range(4)),
                                   batch_size=4, num_workers=2)
        b = next(iter(loader(0)))
        assert b["ru"].shape == (4, 32, 64, 3)
        assert np.isfinite(b["ru"]).all()


class TestPatchCache:
    def _index(self, tmp_path):
        dirs = make_dataset(str(tmp_path))
        return build_index(dirs["json"], dirs["ru"], dirs["en"],
                           dirs["mask"])

    def test_cached_loader_matches_direct(self, tmp_path):
        """Cache hit path must reproduce the direct decode+warp batches
        exactly (uint8 round-trip of /255.0 floats is lossless)."""
        cfg = get_config("v2", patch_h=16, patch_w=32, max_text_len=12)
        samples = self._index(tmp_path)
        idx = list(range(len(samples)))
        direct = HostWarpLoader(cfg, samples, idx, batch_size=4,
                                shuffle=False, drop_last=False,
                                num_workers=2)
        cached = HostWarpLoader(cfg, samples, idx, batch_size=4,
                                shuffle=False, drop_last=False,
                                num_workers=2,
                                cache_dir=str(tmp_path / "cache"))
        for _ in range(2):  # pass 2 reads purely from the memmap
            for a, b in zip(direct(0), cached(0)):
                for key in ("ru", "en", "mask", "text"):
                    np.testing.assert_array_equal(a[key], b[key], err_msg=key)
                assert a["raw_text"] == b["raw_text"]

    def test_cache_persists_and_invalidates(self, tmp_path):
        cfg = get_config("v2", patch_h=16, patch_w=32, max_text_len=12)
        samples = self._index(tmp_path)
        from vae_gan_mark_tpu.data.patch_cache import PatchCache
        cache = PatchCache(str(tmp_path / "c"), cfg, samples)
        cache.prewarm(num_workers=2)
        assert int(cache.filled.min()) == 2
        # Reopen: fingerprint matches, rows stay filled.
        again = PatchCache(str(tmp_path / "c"), cfg, samples)
        assert int(again.filled.min()) == 2
        # Geometry change invalidates.
        cfg2 = get_config("v2", patch_h=32, patch_w=32, max_text_len=12)
        inval = PatchCache(str(tmp_path / "c"), cfg2, samples)
        assert int(inval.filled.max()) == 0

    def test_cache_zero_dummy_semantics(self, tmp_path):
        """A broken source file caches the reference's zero-dummy row
        (vae-gan.py:284-288), same as the direct path."""
        cfg = get_config("v2", patch_h=16, patch_w=32, max_text_len=12)
        samples = self._index(tmp_path)
        os.truncate(samples[0].ru_image_path, 3)
        cached = HostWarpLoader(cfg, samples, [0], batch_size=1,
                                shuffle=False, drop_last=False,
                                num_workers=1,
                                cache_dir=str(tmp_path / "cache"))
        (batch,) = list(cached(0))
        assert batch["ru"].min() == batch["ru"].max() == 0.0
        # Failed rows keep the reference's empty-text semantics, exactly
        # like the direct (uncached) path.
        assert batch["raw_text"] == [""]
        direct = HostWarpLoader(cfg, samples, [0], batch_size=1,
                                shuffle=False, drop_last=False,
                                num_workers=1)
        (dbatch,) = list(direct(0))
        np.testing.assert_array_equal(batch["text"], dbatch["text"])
