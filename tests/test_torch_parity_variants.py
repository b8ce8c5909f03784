"""Checkpoint-porting parity for the remaining reference key schemes.

test_torch_parity.py covers the v2/unet scheme; this file covers:
  * vanilla/lr_sh (vae-gan.py:47-146): nn.Sequential indices
    (``encoder.feat`` / ``decoder.decode``) + the SBERT projection Linear
    (``text_encoder.fc``);
  * oldv (vae-gan-oldv.py:74-320): conv1d + learnable pos_enc in the text
    encoder, 3-level U-Net, GatedSkipConnection alphas.

Each torch model below is written from spec with the *reference's exact
attribute names*, so its state_dict keys are byte-identical to a real
reference checkpoint's — porting it through utils/port_torch.py exercises
the same path a real checkpoint takes.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from vae_gan_mark_tpu.config import get_config  # noqa: E402
from vae_gan_mark_tpu.models.decoders import (  # noqa: E402
    PlainDecoder, UNetStyleDecoder)
from vae_gan_mark_tpu.models.encoders import (  # noqa: E402
    PlainEncoder, UNetEncoder)
from vae_gan_mark_tpu.models.text_encoders import (  # noqa: E402
    CharTextEncoderPosEnc, SbertProjector)
from vae_gan_mark_tpu.utils.port_torch import (  # noqa: E402
    port_generator, port_vanilla_generator, port_v2_generator)

pytestmark = pytest.mark.slow  # full-res torch parity


# ---------------------------------------------------------------------------
# vanilla / lr_sh (vae-gan.py:47-122)
# ---------------------------------------------------------------------------
class _VanillaEncoder(nn.Module):
    def __init__(self, in_ch=4, z_ch=128):
        super().__init__()
        self.feat = nn.Sequential(
            nn.Conv2d(in_ch, 128, 3, 2, 1), nn.BatchNorm2d(128),
            nn.ReLU(True),
            nn.Conv2d(128, 256, 3, 2, 1), nn.BatchNorm2d(256),
            nn.ReLU(True),
            nn.Conv2d(256, 512, 3, 2, 1), nn.BatchNorm2d(512),
            nn.ReLU(True),
            nn.Conv2d(512, 1024, 3, 2, 1), nn.BatchNorm2d(1024),
            nn.ReLU(True),
        )
        self.mu_head = nn.Conv2d(1024, z_ch, kernel_size=(4, 28))
        self.logvar_head = nn.Conv2d(1024, z_ch, kernel_size=(4, 28))

    def forward(self, x):
        h = self.feat(x)
        return self.mu_head(h), self.logvar_head(h)


class _VanillaText(nn.Module):
    """Only the trainable projection; MiniLM embeddings are inputs."""

    def __init__(self, in_dim=384, out_dim=64):
        super().__init__()
        self.fc = nn.Linear(in_dim, out_dim)

    def forward(self, emb):
        return self.fc(emb)


class _VanillaDecoder(nn.Module):
    def __init__(self, z_ch=128, text_ch=64, out_ch=3):
        super().__init__()
        self.decode = nn.Sequential(
            nn.ConvTranspose2d(z_ch + text_ch, 1024, (4, 28), 1, 0),
            nn.BatchNorm2d(1024), nn.ReLU(True),
            nn.ConvTranspose2d(1024, 512, 4, 2, 1),
            nn.BatchNorm2d(512), nn.ReLU(True),
            nn.ConvTranspose2d(512, 256, 4, 2, 1),
            nn.BatchNorm2d(256), nn.ReLU(True),
            nn.ConvTranspose2d(256, 128, 4, 2, 1),
            nn.BatchNorm2d(128), nn.ReLU(True),
            nn.ConvTranspose2d(128, 64, 4, 2, 1),
            nn.BatchNorm2d(64), nn.ReLU(True),
            nn.Conv2d(64, out_ch, 3, 1, 1),
            nn.Sigmoid(),
        )

    def forward(self, zc):
        return self.decode(zc)


class _VanillaGen(nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = _VanillaEncoder()
        self.text_encoder = _VanillaText()
        self.decoder = _VanillaDecoder()


@pytest.fixture(scope="module")
def vanilla_ported():
    torch.manual_seed(0)
    tmodel = _VanillaGen().eval()
    cfg = get_config("vanilla", compute_dtype="float32")
    params, batch_stats = port_vanilla_generator(tmodel.state_dict(), cfg)
    return tmodel, cfg, params, batch_stats


def test_vanilla_encoder_parity(vanilla_ported):
    tmodel, cfg, params, batch_stats = vanilla_ported
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 64, 448, 4)).astype(np.float32)
    with torch.no_grad():
        tmu, tlogvar = tmodel.encoder(
            torch.tensor(np.transpose(x, (0, 3, 1, 2))))
    enc = PlainEncoder(chans=cfg.enc_chans, z_ch=cfg.z_ch, train=False)
    mu, logvar = enc.apply(
        {"params": params["encoder"], "batch_stats": batch_stats["encoder"]},
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(mu)[:, 0, 0, :],
                               tmu.numpy()[:, :, 0, 0],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logvar)[:, 0, 0, :],
                               tlogvar.numpy()[:, :, 0, 0],
                               rtol=1e-3, atol=1e-4)


def test_vanilla_text_and_decoder_parity(vanilla_ported):
    tmodel, cfg, params, batch_stats = vanilla_ported
    rng = np.random.default_rng(1)
    emb = rng.normal(0, 1, (2, cfg.sbert_dim)).astype(np.float32)
    z = rng.normal(0, 1, (2, cfg.z_ch)).astype(np.float32)
    with torch.no_grad():
        ttext = tmodel.text_encoder(torch.tensor(emb))
        tzc = torch.cat([torch.tensor(z), ttext], 1)[:, :, None, None]
        tout = tmodel.decoder(tzc)
    proj = SbertProjector(out_dim=cfg.text_ch)
    jtext = proj.apply({"params": params["text_encoder"]}, jnp.asarray(emb))
    np.testing.assert_allclose(np.asarray(jtext), ttext.numpy(),
                               rtol=1e-4, atol=1e-5)
    zc = jnp.concatenate([jnp.asarray(z), jtext], axis=-1)[:, None, None, :]
    dec = PlainDecoder(latent_h=cfg.latent_h, latent_w=cfg.latent_w,
                       chans=(1024, 512, 256, 128, 64), out_ch=cfg.out_ch,
                       train=False)
    out = dec.apply(
        {"params": params["decoder"], "batch_stats": batch_stats["decoder"]},
        zc)
    np.testing.assert_allclose(
        np.asarray(out), np.transpose(tout.numpy(), (0, 2, 3, 1)),
        rtol=1e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# oldv (vae-gan-oldv.py:74-320)
# ---------------------------------------------------------------------------
def _dconv(in_c, out_c):
    return nn.Sequential(
        nn.Conv2d(in_c, out_c, 3, padding=1, bias=False),
        nn.BatchNorm2d(out_c), nn.ReLU(True),
        nn.Conv2d(out_c, out_c, 3, padding=1, bias=False),
        nn.BatchNorm2d(out_c), nn.ReLU(True))


class _OldvText(nn.Module):
    def __init__(self, vocab=96, emb=128, hid=256, width=28, height=4):
        super().__init__()
        self.embedding = nn.Embedding(vocab, emb, padding_idx=0)
        self.rnn = nn.GRU(emb, hid, num_layers=2, batch_first=True,
                          bidirectional=True, dropout=0.1)
        self.conv1d = nn.Conv1d(2 * hid, 2 * hid, 3, padding=1)
        self.pos_enc = nn.Parameter(
            torch.randn(1, 2 * hid, height, width) * 0.02)
        self.width, self.height = width, height

    def forward(self, tokens):
        y, _ = self.rnn(self.embedding(tokens))
        y = self.conv1d(y.permute(0, 2, 1))
        y = F.adaptive_avg_pool1d(y, self.width)
        y = y.unsqueeze(2).expand(-1, -1, self.height, -1)
        return y + self.pos_enc


class _OldvEncoder(nn.Module):
    def __init__(self, in_ch=4, z_ch=128, skip_chans=(32, 64, 128),
                 bottleneck_ch=256):
        super().__init__()
        self.e_conv1 = _dconv(in_ch, skip_chans[0])
        self.e_conv2 = _dconv(skip_chans[0], skip_chans[1])
        self.e_conv3 = _dconv(skip_chans[1], skip_chans[2])
        self.bottleneck_conv = _dconv(skip_chans[2], bottleneck_ch)
        self.mu_head = nn.Conv2d(bottleneck_ch, z_ch, (8, 56))
        self.logvar_head = nn.Conv2d(bottleneck_ch, z_ch, (8, 56))

    def forward(self, x):
        s1 = self.e_conv1(x)
        s2 = self.e_conv2(F.max_pool2d(s1, 2))
        s3 = self.e_conv3(F.max_pool2d(s2, 2))
        b = self.bottleneck_conv(F.max_pool2d(s3, 2))
        return self.mu_head(b), self.logvar_head(b), [s1, s2, s3]


class _Gate(nn.Module):
    def __init__(self, channels, alpha_init=0.3):
        super().__init__()
        self.alpha = nn.Parameter(torch.ones(1, channels, 1, 1) * alpha_init)

    def forward(self, x):
        return x * torch.sigmoid(self.alpha)


class _Film(nn.Module):
    def __init__(self, tc, nf):
        super().__init__()
        self.param_predictor = nn.Sequential(
            nn.Conv2d(tc, tc, 3, padding=1, bias=False),
            nn.BatchNorm2d(tc), nn.ReLU(True),
            nn.Conv2d(tc, nf * 2, 1))
        self.nf = nf

    def forward(self, x, t):
        t = F.interpolate(t, size=x.shape[2:], mode="bilinear",
                          align_corners=False)
        gb = self.param_predictor(t)
        return gb[:, :self.nf] * x + gb[:, self.nf:]


class _OldvDecoder(nn.Module):
    def __init__(self, z_ch=128, tc=512, out_ch=3,
                 skip_chans=(32, 64, 128), bottleneck_ch=256):
        super().__init__()
        self.initial_w = 56
        self.skip_gates = nn.ModuleList([
            _Gate(skip_chans[2]), _Gate(skip_chans[1]), _Gate(skip_chans[0])])
        self.bottleneck_proc = nn.Sequential(
            nn.ConvTranspose2d(z_ch + tc, bottleneck_ch, (8, 1), 1, 0),
            nn.BatchNorm2d(bottleneck_ch), nn.ReLU(True))
        self.up_tconv1 = nn.ConvTranspose2d(bottleneck_ch, skip_chans[2],
                                            2, 2)
        self.spatial_film1 = _Film(tc, 2 * skip_chans[2])
        self.conv_block1 = _dconv(2 * skip_chans[2], skip_chans[2])
        self.up_tconv2 = nn.ConvTranspose2d(skip_chans[2], skip_chans[1],
                                            2, 2)
        self.spatial_film2 = _Film(tc, 2 * skip_chans[1])
        self.conv_block2 = _dconv(2 * skip_chans[1], skip_chans[1])
        self.up_tconv3 = nn.ConvTranspose2d(skip_chans[1], skip_chans[0],
                                            2, 2)
        self.spatial_film3 = _Film(tc, 2 * skip_chans[0])
        self.conv_block3 = _dconv(2 * skip_chans[0], skip_chans[0])
        self.final_image_conv = nn.Conv2d(skip_chans[0], out_ch, 1)

    def forward(self, z, t, skips):
        z = z.expand(-1, -1, 1, self.initial_w)
        t_b = F.interpolate(t, size=(1, self.initial_w), mode="bilinear",
                            align_corners=False)
        x = self.bottleneck_proc(torch.cat([z, t_b], 1))
        x = torch.cat([self.up_tconv1(x), self.skip_gates[0](skips[2])], 1)
        x = self.conv_block1(self.spatial_film1(x, t))
        x = torch.cat([self.up_tconv2(x), self.skip_gates[1](skips[1])], 1)
        x = self.conv_block2(self.spatial_film2(x, t))
        x = torch.cat([self.up_tconv3(x), self.skip_gates[2](skips[0])], 1)
        x = self.conv_block3(self.spatial_film3(x, t))
        return torch.sigmoid(self.final_image_conv(x))


class _OldvGen(nn.Module):
    def __init__(self):
        super().__init__()
        self.style_vae_encoder_module = _OldvEncoder()
        self.char_text_encoder_module = _OldvText()
        self.image_vae_decoder_module = _OldvDecoder()


@pytest.fixture(scope="module")
def oldv_ported():
    torch.manual_seed(0)
    tmodel = _OldvGen().eval()
    cfg = get_config("oldv", compute_dtype="float32")
    params, batch_stats = port_generator(tmodel.state_dict(), cfg)
    return tmodel, cfg, params, batch_stats


def test_oldv_text_encoder_parity(oldv_ported):
    tmodel, cfg, params, batch_stats = oldv_ported
    rng = np.random.default_rng(1)
    tokens = rng.integers(1, cfg.vocab_size, (2, 60)).astype(np.int32)
    with torch.no_grad():
        tfeat = tmodel.char_text_encoder_module(
            torch.tensor(tokens, dtype=torch.long))
    enc = CharTextEncoderPosEnc(
        vocab_size=cfg.vocab_size, out_width=cfg.text_feature_width,
        out_height=cfg.text_feature_height, emb_dim=cfg.char_emb_dim,
        rnn_hidden=cfg.char_rnn_hidden, rnn_layers=cfg.char_rnn_layers,
        dropout=cfg.char_rnn_dropout, train=False)
    feat = enc.apply({"params": params["text_encoder"]}, jnp.asarray(tokens))
    np.testing.assert_allclose(
        np.asarray(feat), np.transpose(tfeat.numpy(), (0, 2, 3, 1)),
        rtol=1e-3, atol=1e-4)


def test_oldv_encoder_parity(oldv_ported):
    tmodel, cfg, params, batch_stats = oldv_ported
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 64, 448, 4)).astype(np.float32)
    with torch.no_grad():
        tmu, tlogvar, tskips = tmodel.style_vae_encoder_module(
            torch.tensor(np.transpose(x, (0, 3, 1, 2))))
    enc = UNetEncoder(chans=cfg.enc_chans, bottleneck_ch=cfg.bottleneck_ch,
                      z_ch=cfg.z_ch, train=False)
    mu, logvar, skips = enc.apply(
        {"params": params["encoder"], "batch_stats": batch_stats["encoder"]},
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(mu)[:, 0, 0, :],
                               tmu.numpy()[:, :, 0, 0],
                               rtol=1e-3, atol=1e-4)
    for ours, theirs in zip(skips, tskips):
        np.testing.assert_allclose(
            np.asarray(ours), np.transpose(theirs.numpy(), (0, 2, 3, 1)),
            rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("fast_film", [True, False])
def test_oldv_decoder_parity_shared_z(oldv_ported, fast_film):
    tmodel, cfg, params, batch_stats = oldv_ported
    rng = np.random.default_rng(2)
    z = rng.normal(0, 1, (2, cfg.z_ch)).astype(np.float32)
    tokens = rng.integers(1, cfg.vocab_size, (2, 60)).astype(np.int32)
    x = rng.uniform(0, 1, (2, 64, 448, 4)).astype(np.float32)
    with torch.no_grad():
        tx = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
        _, _, tskips = tmodel.style_vae_encoder_module(tx)
        tfeat = tmodel.char_text_encoder_module(
            torch.tensor(tokens, dtype=torch.long))
        tout = tmodel.image_vae_decoder_module(
            torch.tensor(z)[:, :, None, None], tfeat, tskips)
    skips = [jnp.asarray(np.transpose(s.numpy(), (0, 2, 3, 1)))
             for s in tskips]
    tmap = jnp.asarray(np.transpose(tfeat.numpy(), (0, 2, 3, 1)))
    dec = UNetStyleDecoder(latent_h=cfg.latent_h, latent_w=cfg.latent_w,
                           skip_chans=cfg.enc_chans,
                           bottleneck_ch=cfg.bottleneck_ch,
                           out_ch=cfg.out_ch, use_film=True,
                           gated_skips=True, fast_film=fast_film,
                           train=False)
    out = dec.apply(
        {"params": params["decoder"], "batch_stats": batch_stats["decoder"]},
        jnp.asarray(z)[:, None, None, :], tmap, skips)
    np.testing.assert_allclose(
        np.asarray(out), np.transpose(tout.numpy(), (0, 2, 3, 1)),
        rtol=1e-3, atol=2e-4)
