"""Device-warp pipeline vs host (cv2) reference path: same samples in, near-
identical patches out."""

import numpy as np
import pytest

from vae_gan_mark_tpu.config import get_config
from vae_gan_mark_tpu.data.device_pipeline import (
    DeviceWarpLoader, bucket_crop)
from vae_gan_mark_tpu.data.index import build_index
from vae_gan_mark_tpu.data.pipeline import HostWarpLoader

pytestmark = pytest.mark.slow  # jitted warp/model compiles

pytest.importorskip("PIL")
from tests.test_data import make_dataset  # noqa: E402


def test_bucket_crop_geometry():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (200, 300, 3), dtype=np.uint8)
    quad = np.array([[50, 60], [120, 58], [118, 100], [48, 98]], np.float32)
    bucket, adj = bucket_crop(img, quad)
    assert bucket.shape == (256, 1024, 3)
    # Adjusted quad must reference the same pixels: sample a corner.
    x, y = quad[0]
    ax, ay = adj[0]
    np.testing.assert_array_equal(
        bucket[int(ay), int(ax)], img[int(y), int(x)])


def test_bucket_crop_downscales_oversized():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (2000, 3000, 3), dtype=np.uint8)
    quad = np.array([[0, 0], [2900, 0], [2900, 1900], [0, 1900]], np.float32)
    bucket, adj = bucket_crop(img, quad)
    assert bucket.shape == (256, 1024, 3)
    assert adj[:, 0].max() <= 1024 and adj[:, 1].max() <= 256


def test_matches_host_loader(tmp_path):
    dirs = make_dataset(str(tmp_path), n_images=2)
    cfg = get_config("v2", patch_h=32, patch_w=64, compute_dtype="float32",
                     batch_size=4, max_text_len=12)
    samples = build_index(dirs["json"], dirs["ru"], dirs["en"], dirs["mask"])
    idx = list(range(len(samples)))
    host = HostWarpLoader(cfg, samples, idx, batch_size=4, shuffle=False,
                          drop_last=True, num_workers=2)
    dev = DeviceWarpLoader(cfg, samples, idx, batch_size=4, shuffle=False,
                           drop_last=True, num_workers=2)
    hb = next(iter(host(0)))
    db = next(iter(dev(0)))
    for key in ("ru", "en", "mask"):
        a = np.asarray(hb[key])
        b = np.asarray(db[key])
        assert a.shape == b.shape
        # Same geometry, different interpolation stacks (cv2 fixed-point vs
        # device float): small mean difference allowed.
        assert np.mean(np.abs(a - b)) < 0.02, key
    np.testing.assert_array_equal(hb["text"], db["text"])


def test_train_step_with_device_loader(tmp_path):
    """Train a couple of steps fed by the device-warp pipeline."""
    import jax
    import jax.numpy as jnp
    from vae_gan_mark_tpu.models.vgg import load_vgg_params
    from vae_gan_mark_tpu.train.state import create_train_state
    from vae_gan_mark_tpu.train.step import jit_train_step

    dirs = make_dataset(str(tmp_path), n_images=2)
    cfg = get_config("v2", patch_h=32, patch_w=64, compute_dtype="float32",
                     enc_chans=(8, 16, 24, 32), bottleneck_ch=48, z_ch=16,
                     char_emb_dim=16, char_rnn_hidden=16, max_text_len=12,
                     batch_size=4)
    samples = build_index(dirs["json"], dirs["ru"], dirs["en"], dirs["mask"])
    loader = DeviceWarpLoader(cfg, samples, list(range(len(samples))),
                              batch_size=4, shuffle=False, num_workers=2)
    from vae_gan_mark_tpu.data.synthetic import device_batch
    it = iter(loader(0))
    batch0 = device_batch(next(it))
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch0)
    vgg = load_vgg_params()
    step = jit_train_step(cfg)
    state, m = step(state, vgg, batch0, jax.random.PRNGKey(1),
                    jnp.float32(1e-4))
    batch1 = device_batch(next(it))
    state, m = step(state, vgg, batch1, jax.random.PRNGKey(1),
                    jnp.float32(1e-4))
    assert np.isfinite(float(m["loss_G"]))
