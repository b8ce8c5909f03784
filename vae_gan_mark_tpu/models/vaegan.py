"""Top-level VAE-GAN generator: composes encoder, text encoder, and decoder
per variant config. The forward contract matches the reference's single
stable API across all five scripts (vae-gan.py:138-146):

    model(image, mask, text) -> (recon, mu, logvar)

with images NHWC in [0, 1] and ``text`` either precomputed SBERT embeddings
(B, sbert_dim) for the "sbert" variants or int32 token ids (B, max_len) for
the char variants. The reparameterization noise uses the ``sample`` RNG
stream; GRU inter-layer dropout uses ``dropout``.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from vae_gan_mark_tpu.config import VariantConfig
from vae_gan_mark_tpu.models.decoders import PlainDecoder, UNetStyleDecoder
from vae_gan_mark_tpu.models.encoders import PlainEncoder, UNetEncoder
from vae_gan_mark_tpu.models.text_encoders import (
    CharTextEncoder, CharTextEncoderPosEnc, SbertProjector)
from vae_gan_mark_tpu.ops.film import spatial_broadcast
from vae_gan_mark_tpu.ops.sampling import reparameterize


class VAEGANGenerator(nn.Module):
    cfg: VariantConfig
    train: bool = True

    @property
    def dtype(self):
        return jnp.dtype(self.cfg.compute_dtype)

    @nn.compact
    def __call__(self, image, mask, text, eps=None):
        """``eps``: optional externally supplied reparameterization noise
        (same shape as mu, float32). Used for deterministic inference and
        cross-framework trajectory-parity runs; when None (production), the
        noise is drawn from the ``sample`` RNG stream."""
        cfg = self.cfg
        dtype = self.dtype
        x = jnp.concatenate([image, mask], axis=-1).astype(dtype)

        # cfg.remat_encoder: rematerialize the encoder in the backward pass
        # (jax.checkpoint via flax's lifted transform) — trades encoder
        # recompute FLOPs for not keeping its activations in HBM, enabling
        # larger batches. Numerics are unchanged.
        plain_enc, unet_enc = PlainEncoder, UNetEncoder
        if cfg.remat_encoder:
            plain_enc = nn.remat(PlainEncoder)
            unet_enc = nn.remat(UNetEncoder)

        if cfg.generator == "plain":
            mu, logvar = plain_enc(
                chans=cfg.enc_chans, z_ch=cfg.z_ch, train=self.train,
                dtype=dtype, name="encoder")(x)
            skips = None
        else:
            mu, logvar, skips = unet_enc(
                chans=cfg.enc_chans, bottleneck_ch=cfg.bottleneck_ch,
                z_ch=cfg.z_ch, train=self.train, dtype=dtype,
                name="encoder")(x)

        mu32 = mu.astype(jnp.float32)
        logvar32 = logvar.astype(jnp.float32)
        # The reference samples in val/inference too (model.eval() does not
        # bypass reparameterize), so sampling is unconditional here.
        if eps is None:
            z = reparameterize(self.make_rng("sample"), mu32, logvar32)
        else:
            z = mu32 + eps.astype(jnp.float32) * jnp.exp(0.5 * logvar32)
        z = z.astype(dtype)

        if cfg.text_encoder == "sbert":
            emb = SbertProjector(out_dim=cfg.text_ch, dtype=dtype,
                                 name="text_encoder")(text.astype(dtype))
            # z is (B, 1, 1, z_ch): broadcast text over the same 1x1 grid
            # (vae-gan.py:143 broadcasts over z.shape[2:] = (1, 1)).
            text_brd = spatial_broadcast(emb, z.shape[1], z.shape[2])
            zc = jnp.concatenate([z, text_brd], axis=-1)
            recon = PlainDecoder(
                latent_h=cfg.latent_h, latent_w=cfg.latent_w,
                chans=_plain_decoder_chans(cfg), out_ch=cfg.out_ch,
                train=self.train, dtype=dtype, name="decoder")(zc)
        else:
            if cfg.text_encoder == "char":
                text_map = CharTextEncoder(
                    vocab_size=cfg.vocab_size,
                    out_width=cfg.text_feature_width,
                    emb_dim=cfg.char_emb_dim, rnn_hidden=cfg.char_rnn_hidden,
                    rnn_layers=cfg.char_rnn_layers,
                    dropout=cfg.char_rnn_dropout, train=self.train,
                    dtype=dtype, name="text_encoder")(text)
            else:
                text_map = CharTextEncoderPosEnc(
                    vocab_size=cfg.vocab_size,
                    out_width=cfg.text_feature_width,
                    out_height=cfg.text_feature_height,
                    emb_dim=cfg.char_emb_dim, rnn_hidden=cfg.char_rnn_hidden,
                    rnn_layers=cfg.char_rnn_layers,
                    dropout=cfg.char_rnn_dropout, train=self.train,
                    dtype=dtype, name="text_encoder")(text)
            recon = UNetStyleDecoder(
                latent_h=cfg.latent_h, latent_w=cfg.latent_w,
                skip_chans=cfg.enc_chans, bottleneck_ch=cfg.bottleneck_ch,
                out_ch=cfg.out_ch,
                use_film=cfg.generator in ("film4", "film3"),
                gated_skips=cfg.generator == "film3",
                fast_film=cfg.fast_film,
                train=self.train, dtype=dtype, name="decoder")(
                    z, text_map, skips)

        return recon.astype(jnp.float32), mu32, logvar32


def _plain_decoder_chans(cfg: VariantConfig):
    """Vanilla decoder widths: start at the encoder's top width and halve
    down to 64 (vae-gan.py:75-80: 1024, 512, 256, 128, 64)."""
    top = cfg.enc_chans[-1]
    chans = [top]
    c = top
    for _ in range(cfg.num_levels):
        c = max(c // 2, 1)
        chans.append(c)
    return tuple(chans)
