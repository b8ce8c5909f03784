"""End-to-end model parity: a from-spec torch v2 model's weights ported into
our JAX generator must produce the same outputs (eval mode, float32).

The torch side is benchmarks/reference_baseline.py — a faithful from-spec
reimplementation of the v2 architecture (same op sequence and
hyperparameters as vae-gan-v2.py). Its state dict is renamed to the
reference's key scheme and run through utils/port_torch.py, which is also
the path for loading real reference checkpoints.

Component-wise comparison (encoder, text encoder, decoder-with-shared-z)
covers the full generator without needing to synchronize reparameterization
noise across frameworks.
"""

import sys
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from benchmarks.reference_baseline import Gen, renamed_state_dict  # noqa: E402

from vae_gan_mark_tpu.config import get_config  # noqa: E402
from vae_gan_mark_tpu.models.decoders import UNetStyleDecoder  # noqa: E402
from vae_gan_mark_tpu.models.encoders import UNetEncoder  # noqa: E402
from vae_gan_mark_tpu.models.text_encoders import CharTextEncoder  # noqa: E402
from vae_gan_mark_tpu.utils.port_torch import port_v2_generator  # noqa: E402

pytestmark = pytest.mark.slow  # torch goldens + full-model parity


@pytest.fixture(scope="module")
def ported():
    torch.manual_seed(0)
    tmodel = Gen().eval()
    sd = renamed_state_dict(tmodel)
    cfg = get_config("v2", compute_dtype="float32")
    params, batch_stats = port_v2_generator(sd, cfg)
    return tmodel, cfg, params, batch_stats


def test_encoder_parity(ported):
    tmodel, cfg, params, batch_stats = ported
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 64, 448, 4)).astype(np.float32)
    with torch.no_grad():
        tmu, tlogvar, tskips = tmodel.enc(
            torch.tensor(np.transpose(x, (0, 3, 1, 2))))
    enc = UNetEncoder(chans=cfg.enc_chans, bottleneck_ch=cfg.bottleneck_ch,
                      z_ch=cfg.z_ch, train=False)
    mu, logvar, skips = enc.apply(
        {"params": params["encoder"], "batch_stats": batch_stats["encoder"]},
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(mu)[:, 0, 0, :],
                               tmu.numpy()[:, :, 0, 0],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logvar)[:, 0, 0, :],
                               tlogvar.numpy()[:, :, 0, 0],
                               rtol=1e-3, atol=1e-4)
    for ours, theirs in zip(skips, tskips):
        np.testing.assert_allclose(
            np.asarray(ours), np.transpose(theirs.numpy(), (0, 2, 3, 1)),
            rtol=1e-3, atol=1e-4)


def test_text_encoder_parity(ported):
    tmodel, cfg, params, batch_stats = ported
    rng = np.random.default_rng(1)
    tokens = rng.integers(1, 95, (2, 60)).astype(np.int32)
    with torch.no_grad():
        tfeat = tmodel.text(torch.tensor(tokens, dtype=torch.long))
    # torch: (B, 512, 1, 28); ours: (B, 1, 28, 512)
    enc = CharTextEncoder(vocab_size=cfg.vocab_size,
                          out_width=cfg.text_feature_width,
                          emb_dim=cfg.char_emb_dim,
                          rnn_hidden=cfg.char_rnn_hidden,
                          rnn_layers=cfg.char_rnn_layers,
                          dropout=cfg.char_rnn_dropout, train=False)
    feat = enc.apply({"params": params["text_encoder"]},
                     jnp.asarray(tokens))
    np.testing.assert_allclose(
        np.asarray(feat), np.transpose(tfeat.numpy(), (0, 2, 3, 1)),
        rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("fast_film", [True, False])
def test_decoder_parity_shared_z(ported, fast_film):
    tmodel, cfg, params, batch_stats = ported
    rng = np.random.default_rng(2)
    z = rng.normal(0, 1, (2, 128)).astype(np.float32)
    tokens = rng.integers(1, 95, (2, 60)).astype(np.int32)
    x = rng.uniform(0, 1, (2, 64, 448, 4)).astype(np.float32)
    with torch.no_grad():
        tx = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
        _, _, tskips = tmodel.enc(tx)
        tfeat = tmodel.text(torch.tensor(tokens, dtype=torch.long))
        tout = tmodel.dec(torch.tensor(z)[:, :, None, None], tfeat, tskips)
    skips = [jnp.asarray(np.transpose(s.numpy(), (0, 2, 3, 1)))
             for s in tskips]
    tmap = jnp.asarray(np.transpose(tfeat.numpy(), (0, 2, 3, 1)))
    dec = UNetStyleDecoder(latent_h=cfg.latent_h, latent_w=cfg.latent_w,
                           skip_chans=cfg.enc_chans,
                           bottleneck_ch=cfg.bottleneck_ch,
                           out_ch=cfg.out_ch, use_film=True,
                           fast_film=fast_film, train=False)
    out = dec.apply(
        {"params": params["decoder"], "batch_stats": batch_stats["decoder"]},
        jnp.asarray(z)[:, None, None, :], tmap, skips)
    np.testing.assert_allclose(
        np.asarray(out), np.transpose(tout.numpy(), (0, 2, 3, 1)),
        rtol=1e-3, atol=2e-4)
