"""Text-conditioning encoders (three designs, SURVEY.md §2.4).

Unlike the reference — which runs host-side Python string processing inside
``model.forward`` (vae-gan-unet.py:89-96) — tokenization and SBERT embedding
happen in the input pipeline; the modules here consume device arrays only, so
the whole generator forward jits cleanly.

* ``SbertProjector``: the trainable part of the reference's
  ``TransformerTextEncoder`` (vae-gan.py:86-116). The MiniLM sentence
  transformer is effectively frozen there (``model.encode`` is no-grad);
  only the 384->64 Linear trains. Input: precomputed (B, 384) embeddings.
* ``CharTextEncoder`` (vae-gan-v2.py:65-114): char embedding (PAD=0) ->
  2-layer BiGRU -> adaptive-avg-pool to width W/16 -> (B, 1, W/16, 512).
* ``CharTextEncoderPosEnc`` (vae-gan-oldv.py:74-148): adds Conv1d(k3) over
  the sequence, expands to height 4 and adds a learnable positional encoding.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from vae_gan_mark_tpu.ops.pool import adaptive_avg_pool1d
from vae_gan_mark_tpu.ops.precision import precision_for
from vae_gan_mark_tpu.ops.rnn import BiGRU


class SbertProjector(nn.Module):
    """(B, sbert_dim) -> (B, out_dim) via a trainable Linear."""

    out_dim: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, emb):
        return nn.Dense(self.out_dim, dtype=self.dtype,
                        precision=precision_for(self.dtype),
                        param_dtype=jnp.float32)(emb)


class _CharEmbedGRU(nn.Module):
    """Shared front end: PAD-masked char embedding -> BiGRU outputs."""

    vocab_size: int
    emb_dim: int = 128
    rnn_hidden: int = 256
    rnn_layers: int = 2
    dropout: float = 0.1
    train: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        # torch nn.Embedding(padding_idx=0) pins row 0 to zeros with no
        # gradient; multiplying by the pad mask reproduces both properties.
        emb = nn.Embed(self.vocab_size, self.emb_dim,
                       param_dtype=jnp.float32)(tokens)
        emb = emb * (tokens != 0)[..., None].astype(emb.dtype)
        return BiGRU(hidden=self.rnn_hidden, num_layers=self.rnn_layers,
                     dropout=self.dropout, train=self.train,
                     dtype=self.dtype)(emb)


class CharTextEncoder(nn.Module):
    """tokens (B, L) int32 -> spatial text features (B, 1, out_width, 2H)."""

    vocab_size: int
    out_width: int                # W_base_text = patch_w // 16
    emb_dim: int = 128
    rnn_hidden: int = 256
    rnn_layers: int = 2
    dropout: float = 0.1
    train: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        y = _CharEmbedGRU(self.vocab_size, self.emb_dim, self.rnn_hidden,
                          self.rnn_layers, self.dropout, self.train,
                          self.dtype)(tokens)            # (B, L, 2H)
        y = adaptive_avg_pool1d(y, self.out_width)        # (B, W_t, 2H)
        return y[:, None, :, :]                           # (B, 1, W_t, 2H)


class CharTextEncoderPosEnc(nn.Module):
    """oldv flavor: + Conv1d over the sequence, height-4 map, learnable
    positional encoding (init 0.02 * randn, vae-gan-oldv.py:110-115)."""

    vocab_size: int
    out_width: int
    out_height: int = 4
    emb_dim: int = 128
    rnn_hidden: int = 256
    rnn_layers: int = 2
    dropout: float = 0.1
    train: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        y = _CharEmbedGRU(self.vocab_size, self.emb_dim, self.rnn_hidden,
                          self.rnn_layers, self.dropout, self.train,
                          self.dtype)(tokens)            # (B, L, 2H)
        ch = 2 * self.rnn_hidden
        # Conv1d(512, 512, k3, p1) over the sequence axis.
        y = nn.Conv(ch, (3,), padding=((1, 1),), dtype=self.dtype,
                    precision=precision_for(self.dtype),
                    param_dtype=jnp.float32)(y)
        y = adaptive_avg_pool1d(y, self.out_width)        # (B, W_t, 2H)
        y = jnp.broadcast_to(y[:, None, :, :],
                             (y.shape[0], self.out_height, self.out_width, ch))
        pos = self.param(
            "pos_enc",
            lambda key, shape: 0.02 * nn.initializers.normal(1.0)(key, shape),
            (1, self.out_height, self.out_width, ch))
        return y + pos.astype(y.dtype)
