"""Serving engine tests: padded partial batches, checkpoint loading,
full-image render."""

import numpy as np
import pytest

import jax

from vae_gan_mark_tpu.config import get_config
from vae_gan_mark_tpu.models import VAEGANGenerator
from vae_gan_mark_tpu.serve import InferenceEngine

# Generator compiles (even tiny-config) are minutes-long on a 1-core CPU
# host; keep the fast tier free of them.
pytestmark = pytest.mark.slow

TINY = dict(patch_h=32, patch_w=64, compute_dtype="float32",
            enc_chans=(8, 16, 24, 32), bottleneck_ch=48, z_ch=16,
            char_emb_dim=16, char_rnn_hidden=16, max_text_len=12)


def make_engine(batch_size=4):
    cfg = get_config("v2", **TINY)
    model = VAEGANGenerator(cfg=cfg, train=True)
    rng = np.random.default_rng(0)
    import jax.numpy as jnp
    ru = jnp.zeros((2, cfg.patch_h, cfg.patch_w, 3))
    mk = jnp.zeros((2, cfg.patch_h, cfg.patch_w, 1))
    tx = jnp.zeros((2, cfg.max_text_len), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, ru, mk, tx)
    return cfg, InferenceEngine(cfg, variables["params"],
                                variables.get("batch_stats", {}),
                                batch_size=batch_size)


def test_generate_partial_batch():
    cfg, engine = make_engine(batch_size=4)
    rng = np.random.default_rng(1)
    ru = rng.uniform(0, 1, (3, cfg.patch_h, cfg.patch_w, 3)).astype(
        np.float32)
    mask = rng.uniform(0, 1, (3, cfg.patch_h, cfg.patch_w, 1)).astype(
        np.float32)
    out = engine.generate(ru, mask, ["one", "two", "three"])
    assert out.shape == (3, cfg.patch_h, cfg.patch_w, 3)
    assert np.all(np.isfinite(out))
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_generate_deterministic_with_rng():
    cfg, engine = make_engine(batch_size=2)
    rng = np.random.default_rng(2)
    ru = rng.uniform(0, 1, (2, cfg.patch_h, cfg.patch_w, 3)).astype(
        np.float32)
    mask = np.zeros((2, cfg.patch_h, cfg.patch_w, 1), np.float32)
    key = jax.random.PRNGKey(7)
    a = engine.generate(ru, mask, ["x", "y"], rng=key)
    b = engine.generate(ru, mask, ["x", "y"], rng=key)
    np.testing.assert_array_equal(a, b)


def test_render_full_image():
    cfg, engine = make_engine(batch_size=1)
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (90, 140, 3)).astype(np.float32)
    mask = np.zeros((90, 140, 1), np.float32)
    quad = np.array([[20, 15], [110, 18], [108, 60], [18, 57]], np.float32)
    out = engine.render(img, mask, quad, "HELLO")
    assert out.shape == img.shape
    np.testing.assert_allclose(out[80:, 130:], img[80:, 130:], atol=1e-5)


def test_from_checkpoint(tmp_path):
    import jax.numpy as jnp
    from vae_gan_mark_tpu.data.synthetic import device_batch, SyntheticPatchDataset
    from vae_gan_mark_tpu.train.checkpoint import save_checkpoint
    from vae_gan_mark_tpu.train.schedule import PlateauState
    from vae_gan_mark_tpu.train.state import create_train_state
    cfg = get_config("v2", **TINY)
    ds = SyntheticPatchDataset(cfg, num_samples=4, seed=0)
    batch = device_batch(ds.batch(2, 0))
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    save_checkpoint(str(tmp_path), "best_model", state, 0, 1.0,
                    PlateauState(), PlateauState(), 1e-4, 1e-4)
    engine = InferenceEngine.from_checkpoint(cfg, str(tmp_path),
                                             batch_size=2)
    out = engine.generate(
        np.zeros((1, cfg.patch_h, cfg.patch_w, 3), np.float32),
        np.zeros((1, cfg.patch_h, cfg.patch_w, 1), np.float32), ["hi"])
    assert out.shape == (1, cfg.patch_h, cfg.patch_w, 3)


def test_generate_chunks_large_requests():
    cfg, engine = make_engine(batch_size=2)
    rng = np.random.default_rng(4)
    ru = rng.uniform(0, 1, (5, cfg.patch_h, cfg.patch_w, 3)).astype(
        np.float32)
    mask = np.zeros((5, cfg.patch_h, cfg.patch_w, 1), np.float32)
    out = engine.generate(ru, mask, ["a", "b", "c", "d", "e"])
    assert out.shape == (5, cfg.patch_h, cfg.patch_w, 3)
    assert np.all(np.isfinite(out))
