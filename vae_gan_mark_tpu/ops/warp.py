"""On-device perspective (homography) warp — the jit-able replacement for
``cv2.getPerspectiveTransform`` + ``cv2.warpPerspective`` used by the
reference's input pipeline (vae-gan.py:163-200).

The reference crops an arbitrary quadrilateral text region to a fixed
448x64 patch (bilinear, BORDER_REPLICATE) on the host with OpenCV, one image
at a time inside DataLoader workers. Here the whole batch is warped in one
jitted call on device: a batched 8x8 linear solve for the homographies (tiny,
runs on the VPU) followed by a bilinear gather. A host cv2 path is kept only
as a golden reference in tests.

Convention: points are (x, y) pixel coordinates, quads are listed
top-left, top-right, bottom-right, bottom-left (like the reference's
``pts_dst``, vae-gan.py:176).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _rect_pts(w: int, h: int) -> jnp.ndarray:
    """Destination rectangle corners used by the reference (vae-gan.py:176)."""
    return jnp.array(
        [[0.0, 0.0], [w - 1.0, 0.0], [w - 1.0, h - 1.0], [0.0, h - 1.0]],
        jnp.float32)


def solve_homography(src_pts: jnp.ndarray, dst_pts: jnp.ndarray) -> jnp.ndarray:
    """3x3 homography M mapping src_pts -> dst_pts (4 correspondences each).

    Equivalent to cv2.getPerspectiveTransform(src, dst). Batched over leading
    dims via vmap-compatible construction; the 8x8 solve is tiny and fully
    on-device.
    """
    x, y = src_pts[..., 0], src_pts[..., 1]          # (..., 4)
    u, v = dst_pts[..., 0], dst_pts[..., 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    row_u = jnp.stack([x, y, ones, zeros, zeros, zeros, -u * x, -u * y],
                      axis=-1)                        # (..., 4, 8)
    row_v = jnp.stack([zeros, zeros, zeros, x, y, ones, -v * x, -v * y],
                      axis=-1)
    a = jnp.concatenate([row_u, row_v], axis=-2)      # (..., 8, 8)
    rhs = jnp.concatenate([u, v], axis=-1)[..., None]  # (..., 8, 1)
    p = jnp.linalg.solve(a, rhs)[..., 0]              # (..., 8)
    m = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
    return jnp.reshape(m, m.shape[:-1] + (3, 3))


def _apply_homography(m: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Apply 3x3 homography to points (..., 2) -> (..., 2)."""
    x, y = xy[..., 0], xy[..., 1]
    denom = m[2, 0] * x + m[2, 1] * y + m[2, 2]
    u = (m[0, 0] * x + m[0, 1] * y + m[0, 2]) / denom
    v = (m[1, 0] * x + m[1, 1] * y + m[1, 2]) / denom
    return jnp.stack([u, v], axis=-1)


def _bilinear_sample(image: jnp.ndarray, uv: jnp.ndarray,
                     border_replicate: bool = True):
    """Sample (H, W, C) image at float (..., 2) (x, y) coords.

    With ``border_replicate`` coordinates are clamped into the image
    (cv2.BORDER_REPLICATE). Returns samples (..., C) and an in-bounds mask
    (...,) for BORDER_TRANSPARENT-style compositing.
    """
    h, w = image.shape[0], image.shape[1]
    u, v = uv[..., 0], uv[..., 1]
    in_bounds = (u >= 0) & (u <= w - 1) & (v >= 0) & (v <= h - 1)
    u = jnp.clip(u, 0.0, w - 1.0)
    v = jnp.clip(v, 0.0, h - 1.0)
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fx = (u - x0)[..., None]
    fy = (v - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    img = image.astype(jnp.float32)
    p00 = img[y0, x0]
    p01 = img[y0, x1]
    p10 = img[y1, x0]
    p11 = img[y1, x1]
    top = p00 * (1.0 - fx) + p01 * fx
    bot = p10 * (1.0 - fx) + p11 * fx
    return top * (1.0 - fy) + bot * fy, in_bounds


@partial(jax.jit, static_argnums=(2, 3))
def perspective_crop_batch(images: jnp.ndarray, quads: jnp.ndarray,
                           out_h: int, out_w: int) -> jnp.ndarray:
    """Warp a batch of source images' quads into fixed-size patches.

    images: (B, H, W, C) uint8 or float; quads: (B, 4, 2) float (x, y) corner
    coordinates in source-image pixels (TL, TR, BR, BL). Returns
    (B, out_h, out_w, C) float32 in [0, 1] if input was uint8, else same
    scale as input.

    Matches cv2.warpPerspective(INTER_LINEAR, BORDER_REPLICATE) as invoked by
    the reference (vae-gan.py:178-179): the homography maps quad -> rect, and
    each output pixel samples the source at the inverse map.
    """
    rect = _rect_pts(out_w, out_h)
    # Inverse map: output rect -> source quad.
    m_inv = jax.vmap(lambda q: solve_homography(rect, q))(
        quads.astype(jnp.float32))
    xs = jnp.arange(out_w, dtype=jnp.float32)
    ys = jnp.arange(out_h, dtype=jnp.float32)
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (H,W,2)

    def warp_one(image, m):
        uv = _apply_homography(m, grid)
        out, _ = _bilinear_sample(image, uv, border_replicate=True)
        return out

    out = jax.vmap(warp_one)(images, m_inv)
    if images.dtype == jnp.uint8:
        out = out / 255.0
    return out


@partial(jax.jit, static_argnums=(3, 4))
def perspective_unwarp(patch: jnp.ndarray, quad: jnp.ndarray,
                       canvas: jnp.ndarray,
                       out_h: int, out_w: int) -> jnp.ndarray:
    """Paste a patch back onto a canvas at ``quad`` (vae-gan.py:190-200).

    patch: (h, w, C); quad: (4, 2) target corners on the canvas; canvas:
    (out_h, out_w, C) existing content (the reference uses a zero canvas).
    Pixels outside the warped patch are left untouched
    (cv2.BORDER_TRANSPARENT).
    """
    h, w = patch.shape[0], patch.shape[1]
    rect = _rect_pts(w, h)
    # For each canvas pixel, find its source location in the patch:
    # the map canvas-quad -> patch-rect.
    m = solve_homography(quad.astype(jnp.float32), rect)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    ys = jnp.arange(out_h, dtype=jnp.float32)
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
    uv = _apply_homography(m, grid)
    sampled, mask = _bilinear_sample(patch, uv)
    out = jnp.where(mask[..., None], sampled,
                    canvas.astype(jnp.float32))
    return out.astype(canvas.dtype) if canvas.dtype != jnp.uint8 else \
        jnp.clip(out, 0, 255).astype(jnp.uint8)


def pad_to_fixed_size(img: jnp.ndarray, target_h: int, target_w: int,
                      fill: float = 0.0) -> jnp.ndarray:
    """Center-pad an (H, W, C) image to (target_h, target_w).

    Parity with the reference's unused helper (vae-gan.py:202-212); included
    for API completeness. Requires img no larger than the target.
    """
    h, w = img.shape[0], img.shape[1]
    top = max(0, (target_h - h) // 2)
    left = max(0, (target_w - w) // 2)
    out = jnp.full((target_h, target_w) + img.shape[2:], fill, img.dtype)
    return jax.lax.dynamic_update_slice(
        out, img, (top, left) + (0,) * (img.ndim - 2))


def center_crop_like(src: jnp.ndarray, target_h: int,
                     target_w: int) -> jnp.ndarray:
    """Center-crop NHWC tensor spatially to (target_h, target_w).

    Parity with the reference's unused helper (vae-gan-oldv.py:63-71).
    """
    h, w = src.shape[1], src.shape[2]
    top = (h - target_h) // 2
    left = (w - target_w) // 2
    return src[:, top:top + target_h, left:left + target_w, :]
