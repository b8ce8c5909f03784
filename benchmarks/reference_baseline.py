"""Torch-CPU baseline measurement for BASELINE.md.

The reference repo ships no benchmark harness (SURVEY.md §6), so this script
provides the "reference side": a from-spec PyTorch implementation of the v2
variant's per-batch training step (generator forward, D update, G update with
all four losses — the schedule of vae-gan-v2.py:696-740) timed on CPU with
the reference's batch size 16 at 448x64.

Notes on fidelity vs. the reference scripts:
  * architecture hyperparameters match vae-gan-v2.py (U-Net 64-1024,
    char BiGRU 2x256, SpatialFiLM at each stage, PatchGAN with spectral
    norm);
  * the perceptual loss uses a frozen randomly-initialized VGG16-features[:16]
    clone (torchvision is unavailable offline; FLOPs and memory traffic are
    identical to pretrained weights, which is what a throughput baseline
    measures);
  * data is synthetic random tensors — this measures compute, not disk I/O.

Run: python benchmarks/reference_baseline.py [--steps N]
Writes benchmarks/baseline_torch_cpu.json.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import torch
import torch.nn as nn
import torch.nn.functional as F
from torch.nn.utils import clip_grad_norm_, spectral_norm


def dconv(cin, cout):
    return nn.Sequential(
        nn.Conv2d(cin, cout, 3, padding=1, bias=False),
        nn.BatchNorm2d(cout), nn.ReLU(True),
        nn.Conv2d(cout, cout, 3, padding=1, bias=False),
        nn.BatchNorm2d(cout), nn.ReLU(True))


class Encoder(nn.Module):
    def __init__(self, z=128, chans=(64, 128, 256, 512), bottleneck=1024,
                 latent_hw=(4, 28)):
        super().__init__()
        self.blocks = nn.ModuleList()
        cin = 4
        for c in chans:
            self.blocks.append(dconv(cin, c))
            cin = c
        self.bottom = dconv(chans[-1], bottleneck)
        self.mu = nn.Conv2d(bottleneck, z, latent_hw)
        self.logvar = nn.Conv2d(bottleneck, z, latent_hw)

    def forward(self, x):
        skips = []
        for blk in self.blocks:
            x = blk(x)
            skips.append(x)
            x = F.max_pool2d(x, 2)
        x = self.bottom(x)
        return self.mu(x), self.logvar(x), skips


class TextEnc(nn.Module):
    def __init__(self, vocab=96, emb=128, hid=256, dropout=0.1, width=28):
        super().__init__()
        self.emb = nn.Embedding(vocab, emb, padding_idx=0)
        self.gru = nn.GRU(emb, hid, num_layers=2, batch_first=True,
                          bidirectional=True, dropout=dropout)
        self.width = width

    def forward(self, tokens):
        y, _ = self.gru(self.emb(tokens))
        y = F.adaptive_avg_pool1d(y.permute(0, 2, 1), self.width)
        return y.unsqueeze(2)  # (B, 2*hid, 1, width)


class Film(nn.Module):
    def __init__(self, tc, nf):
        super().__init__()
        self.net = nn.Sequential(
            nn.Conv2d(tc, tc, 3, padding=1, bias=False),
            nn.BatchNorm2d(tc), nn.ReLU(True),
            nn.Conv2d(tc, nf * 2, 1))
        self.nf = nf

    def forward(self, x, t):
        t = F.interpolate(t, size=x.shape[2:], mode="bilinear",
                          align_corners=False)
        gb = self.net(t)
        return gb[:, :self.nf] * x + gb[:, self.nf:]


class Decoder(nn.Module):
    def __init__(self, z=128, tc=512, chans=(64, 128, 256, 512),
                 bottleneck=1024, latent_hw=(4, 28)):
        super().__init__()
        self.latent_hw = latent_hw
        self.bottom = nn.Sequential(
            nn.ConvTranspose2d(z + tc, bottleneck, (latent_hw[0], 1)),
            nn.BatchNorm2d(bottleneck), nn.ReLU(True))
        specs = list(zip((bottleneck,) + tuple(reversed(chans))[:-1],
                         reversed(chans)))
        self.ups = nn.ModuleList(
            nn.ConvTranspose2d(a, b, 2, 2) for a, b in specs)
        self.films = nn.ModuleList(Film(tc, 2 * b) for _, b in specs)
        self.convs = nn.ModuleList(dconv(2 * b, b) for _, b in specs)
        self.out = nn.Conv2d(chans[0], 3, 1)

    def forward(self, z, t, skips):
        x = torch.cat([z.expand(-1, -1, 1, self.latent_hw[1]), t], 1)
        x = self.bottom(x)
        for up, film, conv, skip in zip(self.ups, self.films, self.convs,
                                        reversed(skips)):
            x = torch.cat([up(x), skip], 1)
            x = film(x, t)
            x = conv(x)
        return torch.sigmoid(self.out(x))


class Gen(nn.Module):
    """From-spec torch v2; defaults are the reference's full size. Pass a
    VariantConfig-like ``cfg`` to build a scaled-down but op-identical
    version (used by benchmarks/train_parity.py on 1-core hosts where a
    full-size torch step costs minutes)."""

    def __init__(self, dropout=0.1, cfg=None):
        super().__init__()
        if cfg is None:
            self.enc = Encoder()
            self.text = TextEnc(dropout=dropout)
            self.dec = Decoder()
        else:
            latent_hw = (cfg.latent_h, cfg.latent_w)
            self.enc = Encoder(z=cfg.z_ch, chans=cfg.enc_chans,
                               bottleneck=cfg.bottleneck_ch,
                               latent_hw=latent_hw)
            self.text = TextEnc(vocab=cfg.vocab_size, emb=cfg.char_emb_dim,
                                hid=cfg.char_rnn_hidden, dropout=dropout,
                                width=cfg.text_feature_width)
            self.dec = Decoder(z=cfg.z_ch, tc=2 * cfg.char_rnn_hidden,
                               chans=cfg.enc_chans,
                               bottleneck=cfg.bottleneck_ch,
                               latent_hw=latent_hw)

    def forward(self, img, mask, tokens, eps=None):
        mu, logvar, skips = self.enc(torch.cat([img, mask], 1))
        if eps is None:
            eps = torch.randn_like(mu)
        z = mu + eps * torch.exp(0.5 * logvar)
        return self.dec(z, self.text(tokens), skips), mu, logvar


class Disc(nn.Module):
    def __init__(self):
        super().__init__()
        layers = [spectral_norm(nn.Conv2d(3, 64, 4, 2, 1)),
                  nn.LeakyReLU(0.2, True)]
        c = 64
        for _ in range(3):
            layers += [spectral_norm(nn.Conv2d(c, c * 2, 4, 2, 1)),
                       nn.InstanceNorm2d(c * 2, affine=True),
                       nn.LeakyReLU(0.2, True)]
            c *= 2
        layers.append(nn.Conv2d(512, 1, 4, 1, 1))
        self.net = nn.Sequential(*layers)

    def forward(self, x):
        return self.net(x)


class VGGHead(nn.Module):
    """features[:16]-shaped frozen conv pyramid for perceptual-loss FLOPs."""

    def __init__(self):
        super().__init__()
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256]
        layers, cin = [], 3
        for c in cfg:
            if c == "M":
                layers.append(nn.MaxPool2d(2))
            else:
                layers += [nn.Conv2d(cin, c, 3, padding=1), nn.ReLU(True)]
                cin = c
        self.net = nn.Sequential(*layers).eval()
        for p in self.parameters():
            p.requires_grad_(False)

    def forward(self, x):
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        return self.net((x - mean) / std)


# from-spec attribute names -> the reference's checkpoint key scheme
# (vae-gan-v2.py:283-327), so Gen's state dict can flow through
# utils/port_torch.port_v2_generator exactly like a real checkpoint.
REFERENCE_RENAME = [
    ("enc.blocks.0.", "style_vae_encoder_module.e_conv1."),
    ("enc.blocks.1.", "style_vae_encoder_module.e_conv2."),
    ("enc.blocks.2.", "style_vae_encoder_module.e_conv3."),
    ("enc.blocks.3.", "style_vae_encoder_module.e_conv4."),
    ("enc.bottom.", "style_vae_encoder_module.bottleneck_conv."),
    ("enc.mu.", "style_vae_encoder_module.mu_head."),
    ("enc.logvar.", "style_vae_encoder_module.logvar_head."),
    ("text.emb.", "char_text_encoder_module.embedding."),
    ("text.gru.", "char_text_encoder_module.rnn."),
    ("dec.bottom.", "image_vae_decoder_module.bottleneck_proc."),
    ("dec.ups.0.", "image_vae_decoder_module.up_tconv1."),
    ("dec.ups.1.", "image_vae_decoder_module.up_tconv2."),
    ("dec.ups.2.", "image_vae_decoder_module.up_tconv3."),
    ("dec.ups.3.", "image_vae_decoder_module.up_tconv4."),
    ("dec.films.0.net.",
     "image_vae_decoder_module.spatial_film1.param_predictor."),
    ("dec.films.1.net.",
     "image_vae_decoder_module.spatial_film2.param_predictor."),
    ("dec.films.2.net.",
     "image_vae_decoder_module.spatial_film3.param_predictor."),
    ("dec.films.3.net.",
     "image_vae_decoder_module.spatial_film4.param_predictor."),
    ("dec.convs.0.", "image_vae_decoder_module.conv_block1."),
    ("dec.convs.1.", "image_vae_decoder_module.conv_block2."),
    ("dec.convs.2.", "image_vae_decoder_module.conv_block3."),
    ("dec.convs.3.", "image_vae_decoder_module.conv_block4."),
    ("dec.out.", "image_vae_decoder_module.final_image_conv."),
]


def renamed_state_dict(gen):
    sd = {}
    for key, val in gen.state_dict().items():
        for src, dst in REFERENCE_RENAME:
            if key.startswith(src):
                key = dst + key[len(src):]
                break
        sd[key] = val
    return sd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    torch.manual_seed(0)
    gen, disc, vgg = Gen(), Disc(), VGGHead()
    opt_g = torch.optim.Adam(gen.parameters(), 1e-4, betas=(0.5, 0.999))
    opt_d = torch.optim.Adam(disc.parameters(), 1e-4, betas=(0.5, 0.999))

    b = args.batch
    img = torch.rand(b, 3, 64, 448)
    mask = torch.rand(b, 1, 64, 448)
    target = torch.rand(b, 3, 64, 448)
    tokens = torch.randint(1, 95, (b, 60))

    def train_step():
        fake, mu, logvar = gen(img, mask, tokens)
        opt_d.zero_grad()
        loss_d = 0.5 * (F.relu(1 - disc(target)).mean()
                        + F.relu(1 + disc(fake.detach())).mean())
        loss_d.backward()
        opt_d.step()
        opt_g.zero_grad()
        recon = F.l1_loss(fake, target)
        kl = (-0.5 * (1 + logvar - mu.pow(2) - logvar.exp())
              .mean(dim=[1, 2, 3])).mean()
        gan = -disc(fake).mean()
        perc = F.l1_loss(vgg(fake), vgg(target))
        (recon + 1e-3 * kl + 0.15 * gan + 0.1 * perc).backward()
        clip_grad_norm_(gen.parameters(), 1.0)
        opt_g.step()

    train_step()  # warmup
    t0 = time.time()
    for _ in range(args.steps):
        train_step()
    dt = time.time() - t0
    ips = args.steps * b / dt
    out = {
        "images_per_sec": ips,
        "sec_per_step": dt / args.steps,
        "batch_size": b,
        "device": "cpu",
        "threads": torch.get_num_threads(),
        "host_cpu_count": os.cpu_count(),
        "variant": "v2 (448x64, from-spec torch reimplementation)",
    }
    path = os.path.join(os.path.dirname(__file__),
                        "baseline_torch_cpu.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
