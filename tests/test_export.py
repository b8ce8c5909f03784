"""AOT serving-export tests: jax.export round-trip vs direct apply, the
no-model-code loader, text-spec handling, and chunked generate."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vae_gan_mark_tpu.config import get_config
from vae_gan_mark_tpu.models import VAEGANGenerator
from vae_gan_mark_tpu.serve.export import (
    EXPORT_NAME, MANIFEST_NAME, PARAMS_NAME, ExportedGenerator,
    export_generator)

# Full generator compiles — slow tier on the 1-core host (same policy as
# test_serve.py).
pytestmark = pytest.mark.slow

TINY = dict(patch_h=32, patch_w=64, compute_dtype="float32",
            enc_chans=(8, 16, 24, 32), bottleneck_ch=48, z_ch=16,
            char_emb_dim=16, char_rnn_hidden=16, max_text_len=12)


def _init_variables(cfg):
    model = VAEGANGenerator(cfg=cfg, train=True)
    ru = jnp.zeros((2, cfg.patch_h, cfg.patch_w, 3))
    mk = jnp.zeros((2, cfg.patch_h, cfg.patch_w, 1))
    if cfg.text_encoder == "sbert":
        tx = jnp.zeros((2, cfg.sbert_dim), jnp.float32)
    else:
        tx = jnp.zeros((2, cfg.max_text_len), jnp.int32)
    return model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, ru, mk, tx)


def _export_tiny(tmp_path, variant="v2", batch_size=2, **cfg_kw):
    kw = dict(TINY)
    kw.update(cfg_kw)
    cfg = get_config(variant, **kw)
    variables = _init_variables(cfg)
    # Export for the ambient backend (the axon plugin registers the real
    # TPU even under JAX_PLATFORMS=cpu, and an artifact can only be called
    # on a platform it was lowered for).
    art = export_generator(cfg, variables["params"],
                           variables.get("batch_stats", {}),
                           str(tmp_path / "art"), batch_size=batch_size,
                           platforms=(jax.default_backend(),))
    return cfg, variables, art


def test_export_roundtrip_matches_direct_apply(tmp_path):
    cfg, variables, art = _export_tiny(tmp_path, batch_size=2)
    for name in (EXPORT_NAME, PARAMS_NAME, MANIFEST_NAME):
        assert os.path.getsize(os.path.join(art, name)) > 0

    gen = ExportedGenerator.load(art)
    rng = np.random.default_rng(1)
    ru = rng.uniform(0, 1, (2, cfg.patch_h, cfg.patch_w, 3)).astype(
        np.float32)
    mask = rng.uniform(0, 1, (2, cfg.patch_h, cfg.patch_w, 1)).astype(
        np.float32)
    text = gen.encode_texts(["abc", "xy"])
    out = gen.call(ru, mask, text, seed=7)

    model = VAEGANGenerator(cfg=cfg, train=False)
    direct, _, _ = model.apply(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})},
        jnp.asarray(ru), jnp.asarray(mask), jnp.asarray(text),
        rngs={"sample": jax.random.PRNGKey(7)})
    np.testing.assert_allclose(out, np.asarray(direct), atol=1e-5)


def test_exported_generate_chunks_and_pads(tmp_path):
    cfg, _, art = _export_tiny(tmp_path, batch_size=2)
    gen = ExportedGenerator.load(art)
    rng = np.random.default_rng(2)
    ru = rng.uniform(0, 1, (3, cfg.patch_h, cfg.patch_w, 3)).astype(
        np.float32)
    mask = np.zeros((3, cfg.patch_h, cfg.patch_w, 1), np.float32)
    out = gen.generate(ru, mask, ["one", "two", "three"])
    assert out.shape == (3, cfg.patch_h, cfg.patch_w, 3)
    assert np.all(np.isfinite(out))


def test_manifest_records_io_spec(tmp_path):
    cfg, _, art = _export_tiny(tmp_path, batch_size=2)
    with open(os.path.join(art, MANIFEST_NAME)) as f:
        m = json.load(f)
    assert m["variant"] == "v2"
    assert m["text_encoder"] == "char"
    assert m["text_shape"] == [2, cfg.max_text_len]
    assert m["text_dtype"] == "int32"
    assert m["platforms"] == [jax.default_backend()]


def test_multiplatform_artifact_lowered_for_cpu_and_tpu(tmp_path):
    """The default cpu+tpu artifact traces (portable GRU path), serializes,
    and is callable on whatever backend this host has."""
    kw = dict(TINY)
    cfg = get_config("v2", **kw)
    variables = _init_variables(cfg)
    art = export_generator(cfg, variables["params"],
                           variables.get("batch_stats", {}),
                           str(tmp_path / "art"), batch_size=2,
                           platforms=("cpu", "tpu"))
    gen = ExportedGenerator.load(art)
    assert gen.manifest["platforms"] == ["cpu", "tpu"]
    ru = np.zeros((2, cfg.patch_h, cfg.patch_w, 3), np.float32)
    mask = np.zeros((2, cfg.patch_h, cfg.patch_w, 1), np.float32)
    out = gen.generate(ru, mask, ["ab", "cd"])
    assert out.shape == (2, cfg.patch_h, cfg.patch_w, 3)
    assert np.all(np.isfinite(out))


def test_sbert_artifact_refuses_pseudo_embeddings(tmp_path):
    cfg, _, art = _export_tiny(tmp_path, variant="vanilla", batch_size=2)
    gen = ExportedGenerator.load(art)
    assert gen.manifest["text_encoder"] == "sbert"
    ru = np.zeros((2, cfg.patch_h, cfg.patch_w, 3), np.float32)
    mask = np.zeros((2, cfg.patch_h, cfg.patch_w, 1), np.float32)
    with pytest.raises(RuntimeError, match="SBERT"):
        gen.generate(ru, mask, ["a", "b"])
    # ...but an explicit embed fn works.
    fn = lambda texts: np.zeros((len(texts), cfg.sbert_dim), np.float32)
    out = gen.generate(ru, mask, ["a", "b"], text_embed_fn=fn)
    assert out.shape == (2, cfg.patch_h, cfg.patch_w, 3)
