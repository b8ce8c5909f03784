"""Homography warp tests: on-device warp vs cv2 golden values.

cv2 warpPerspective uses 5-bit fixed-point interpolation internally, so
tolerances are a few gray levels on a uint8 scale.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vae_gan_mark_tpu.ops.warp import (
    perspective_crop_batch, perspective_unwarp, solve_homography)

cv2 = pytest.importorskip("cv2")


def random_quad(rng, w, h):
    """A convex-ish quad inside the image with jittered corners."""
    cx, cy = rng.uniform(0.3, 0.7) * w, rng.uniform(0.3, 0.7) * h
    hw, hh = rng.uniform(0.15, 0.25) * w, rng.uniform(0.1, 0.2) * h
    base = np.array([[cx - hw, cy - hh], [cx + hw, cy - hh],
                     [cx + hw, cy + hh], [cx - hw, cy + hh]])
    jitter = rng.uniform(-0.05, 0.05, (4, 2)) * [w, h]
    return (base + jitter).astype(np.float32)


class TestHomographySolve:
    def test_matches_cv2_getperspectivetransform(self):
        rng = np.random.default_rng(0)
        for _ in range(5):
            src = random_quad(rng, 640, 480)
            dst = np.array([[0, 0], [447, 0], [447, 63], [0, 63]],
                           np.float32)
            m_ours = np.asarray(solve_homography(jnp.asarray(src),
                                                 jnp.asarray(dst)))
            m_cv = cv2.getPerspectiveTransform(src, dst)
            np.testing.assert_allclose(m_ours, m_cv, rtol=1e-4, atol=1e-5)


class TestPerspectiveCrop:
    def test_matches_cv2_warp(self):
        rng = np.random.default_rng(1)
        h_src, w_src = 240, 320
        img = rng.integers(0, 256, (h_src, w_src, 3), dtype=np.uint8)
        # Smooth the image so subpixel interpolation differences (cv2 uses
        # 5-bit fixed point) stay small.
        img = cv2.GaussianBlur(img, (5, 5), 2.0)
        quad = random_quad(rng, w_src, h_src)
        out_w, out_h = 448, 64

        dst = np.array([[0, 0], [out_w - 1, 0], [out_w - 1, out_h - 1],
                        [0, out_h - 1]], np.float32)
        m = cv2.getPerspectiveTransform(quad, dst)
        golden = cv2.warpPerspective(img, m, (out_w, out_h),
                                     flags=cv2.INTER_LINEAR,
                                     borderMode=cv2.BORDER_REPLICATE)

        ours = perspective_crop_batch(
            jnp.asarray(img[None]), jnp.asarray(quad[None]), out_h, out_w)
        ours_u8 = np.clip(np.asarray(ours[0]) * 255.0, 0, 255)

        diff = np.abs(ours_u8.astype(np.float32) - golden.astype(np.float32))
        # Allow small interpolation differences; the bulk must agree closely.
        assert np.mean(diff) < 1.0, f"mean abs diff {np.mean(diff)}"
        assert np.percentile(diff, 99) < 8.0

    def test_axis_aligned_crop_is_exact(self):
        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, (100, 200, 3), dtype=np.uint8)
        # Axis-aligned quad: warp degenerates to a (possibly scaled) crop;
        # with matching size it is an exact pixel copy.
        quad = np.array([[10, 20], [10 + 447 / 8, 20],
                         [10 + 447 / 8, 20 + 63], [10, 20 + 63]], np.float32)
        quad = np.array([[10, 20], [57, 20], [57, 51], [10, 51]], np.float32)
        out_h, out_w = 32, 48
        ours = perspective_crop_batch(
            jnp.asarray(img[None]), jnp.asarray(quad[None]), out_h, out_w)
        expected = img[20:52, 10:58].astype(np.float32) / 255.0
        np.testing.assert_allclose(np.asarray(ours[0]), expected, atol=3e-5)


class TestUnwarp:
    def test_roundtrip_paste_back(self):
        """crop -> unwarp puts the patch back where it came from."""
        rng = np.random.default_rng(3)
        h_src, w_src = 120, 160
        img = rng.integers(0, 256, (h_src, w_src, 3), dtype=np.uint8)
        img = cv2.GaussianBlur(img, (7, 7), 3.0)
        quad = np.array([[30, 20], [120, 25], [115, 90], [25, 85]],
                        np.float32)
        out_h, out_w = 64, 96
        patch = perspective_crop_batch(
            jnp.asarray(img[None]), jnp.asarray(quad[None]), out_h, out_w)[0]
        canvas = jnp.zeros((h_src, w_src, 3), jnp.float32)
        pasted = perspective_unwarp(patch, jnp.asarray(quad), canvas,
                                    h_src, w_src)
        pasted = np.asarray(pasted)

        # Compare on the interior of the quad (borders suffer double
        # interpolation).
        mask = np.zeros((h_src, w_src), np.uint8)
        shrunk = quad.mean(axis=0) + (quad - quad.mean(axis=0)) * 0.8
        cv2.fillPoly(mask, [shrunk.astype(np.int32)], 1)
        sel = mask.astype(bool)
        orig = img.astype(np.float32) / 255.0
        diff = np.abs(pasted[sel] - orig[sel])
        assert np.mean(diff) < 0.02
        # Outside the quad the canvas must be untouched (BORDER_TRANSPARENT).
        outside = np.zeros((h_src, w_src), np.uint8)
        cv2.fillPoly(outside, [quad.astype(np.int32)], 1)
        grown = cv2.dilate(outside, np.ones((9, 9), np.uint8))
        assert np.all(pasted[~grown.astype(bool)] == 0)
