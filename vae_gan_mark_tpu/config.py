"""Typed configuration for every model/training variant.

The reference encodes its configuration as module-level constants duplicated
per script (e.g. /root/reference/vae-gan.py:26-44, vae-gan-v2.py:26-61).
Here each of the five variants is a frozen dataclass; the CLI can override any
field.

Variant table (reference file -> config name):
  vae-gan.py       -> "vanilla"  (SBERT text, plain conv-transpose decoder)
  vae-gan-lr-sh.py -> "lr_sh"    (vanilla + ReduceLROnPlateau, full-loss val)
  vae-gan-unet.py  -> "unet"     (char BiGRU text, U-Net decoder; the
                                  reference's decoder is shape-broken — see
                                  vae-gan-unet.py:193-249 — we implement the
                                  corrected topology: v2 ordering minus FiLM)
  vae-gan-v2.py    -> "v2"       (char BiGRU, U-Net + SpatialFiLM, KL anneal)
  vae-gan-oldv.py  -> "oldv"     (char BiGRU + conv1d + learnable pos-enc,
                                  3-level U-Net, gated skips, KL anneal)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

# Alphabets (reference: vae-gan-v2.py:33 ASCII-only; vae-gan-unet.py:34 adds
# Cyrillic). PAD token is index 0; out-of-vocabulary characters map to PAD.
ASCII_ALPHABET = (
    " !\"#$%&'()*+,-./0123456789:;<=>?@ABCDEFGHIJKLMNOPQRSTUVWXYZ[\\]^_`"
    "abcdefghijklmnopqrstuvwxyz{|}~"
)
CYRILLIC = (
    "абвгдеёжзийклмнопрстуфхцчшщъыьэюя"
    "АБВГДЕЁЖЗИЙКЛМНОПРСТУФХЦЧШЩЪЫЬЭЮЯ"
)
ASCII_CYRILLIC_ALPHABET = ASCII_ALPHABET + CYRILLIC

MAX_TEXT_LEN = 60  # reference tokenizes to at most 60 chars (vae-gan-unet.py:98)


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    """ReduceLROnPlateau on val recon loss (vae-gan-lr-sh.py:43-47)."""

    factor: float = 0.95
    patience: int = 15
    threshold: float = 1e-4
    min_lr: float = 1e-7


@dataclasses.dataclass(frozen=True)
class VariantConfig:
    name: str = "v2"

    # --- geometry ---
    patch_h: int = 64
    patch_w: int = 448
    in_ch: int = 4          # RGB image + mask
    out_ch: int = 3
    z_ch: int = 128

    # --- text conditioning ---
    # "sbert": precomputed 384-d sentence embedding -> trainable Linear -> 64,
    #          spatially broadcast at the bottleneck (vae-gan.py:86-122).
    # "char": char embedding -> 2-layer BiGRU -> adaptive pool to W/16
    #         (vae-gan-v2.py:65-114).
    # "char_posenc": char path + Conv1d + learnable 2-D positional encoding,
    #         output height 4 (vae-gan-oldv.py:74-148).
    text_encoder: str = "char"
    alphabet: str = ASCII_ALPHABET
    max_text_len: int = MAX_TEXT_LEN
    sbert_dim: int = 384
    text_ch: int = 64          # SBERT projection dim (vanilla / lr_sh)
    char_emb_dim: int = 128
    char_rnn_hidden: int = 256  # per direction; BiGRU output = 512
    char_rnn_layers: int = 2
    char_rnn_dropout: float = 0.1
    text_feature_height: int = 1  # oldv uses 4

    # --- generator architecture ---
    # "plain": conv stack encoder + conv-transpose decoder (vanilla / lr_sh);
    #          enc_chans are the stride-2 conv outputs (vae-gan.py:51-56).
    # "unet":  4-level U-Net with concat skips (corrected "unet" variant);
    #          enc_chans are the skip channels, bottleneck_ch the bottom width.
    # "film4": 4-level U-Net + SpatialFiLM at every stage (v2)
    # "film3": 3-level U-Net + gated skips + SpatialFiLM (oldv)
    generator: str = "film4"
    enc_chans: Tuple[int, ...] = (64, 128, 256, 512)   # oldv: (32, 64, 128)
    bottleneck_ch: int = 1024                          # oldv: 256

    # --- losses ---
    recon_weight: float = 1.0
    kl_weight: float = 0.001
    gan_weight: float = 0.15
    perc_weight: float = 0.1
    # KL annealing (vae-gan-v2.py:48-49, applied at vae-gan-v2.py:1002-1004):
    # linear from start_kl_weight to kl_weight over kl_anneal_epochs.
    kl_anneal_epochs: int = 0
    start_kl_weight: float = 1e-7

    # --- optimization ---
    batch_size: int = 16
    epochs: int = 200
    # Save last_checkpoint every N epochs (1 = reference semantics,
    # vae-gan-v2.py:799-818; best_model still saves on every improvement).
    # Raising it bounds resume granularity but amortizes the device->host
    # fetch of the full optimizer state — significant when the chip sits
    # behind a network tunnel rather than local PCIe.
    save_every: int = 1
    lr_g: float = 1e-4
    lr_d: float = 1e-4
    adam_b1: float = 0.5
    adam_b2: float = 0.999
    grad_clip_norm: float = 1.0   # applied to G only (vae-gan.py:424)
    scheduler: Optional[SchedulerConfig] = None

    # --- evaluation ---
    full_loss_val: bool = False  # lr_sh/v2/oldv compute all losses in val

    # --- TPU-specific execution knobs (no reference equivalent) ---
    compute_dtype: str = "bfloat16"   # "float32" for parity tests
    # Run D(real) and D(fake) as one concatenated forward. InstanceNorm is
    # per-sample so activations are bitwise-identical; the only deviation is
    # one spectral-norm power iteration per step instead of two. Perf win on
    # MXU; set False for strict reference semantics.
    fused_disc_forward: bool = True
    # Remat the generator encoder to trade FLOPs for HBM on large batches.
    remat_encoder: bool = False
    # OPT-IN projection-conditional discriminator (models/discriminator.py):
    # D embeds the text itself and judges realism *given the string*. The
    # reference's D is unconditional (vae-gan.py:148-159) so this defaults
    # off; built as the structural fix the five-run GAN-conditioning series
    # points to (examples/vocab_run/gan007_continuation/README.md).
    conditional_disc: bool = False
    # Exact row-factored SpatialFiLM predictor for height-1 text maps
    # (unet/v2): ~21x fewer FiLM FLOPs, bit-identical math (see ops/film.py).
    fast_film: bool = True
    # --- data ---
    val_split: float = 0.1
    split_seed: int = 42

    @property
    def vocab_size(self) -> int:
        return len(self.alphabet) + 1  # +1 for PAD at index 0

    @property
    def num_levels(self) -> int:
        return len(self.enc_chans)

    @property
    def latent_h(self) -> int:
        return self.patch_h // (2 ** self.num_levels)

    @property
    def latent_w(self) -> int:
        return self.patch_w // (2 ** self.num_levels)

    @property
    def text_feature_width(self) -> int:
        # W_base_text is always W/16 even for the 3-level oldv generator
        # (vae-gan-oldv.py:330).
        return self.patch_w // 16

    def validate(self) -> "VariantConfig":
        assert self.patch_h % (2 ** self.num_levels) == 0, (
            f"patch_h={self.patch_h} not divisible by 2^{self.num_levels}")
        assert self.patch_w % (2 ** self.num_levels) == 0
        assert self.patch_w % 16 == 0, "text feature width is patch_w // 16"
        assert self.text_encoder in ("sbert", "char", "char_posenc")
        assert self.generator in ("plain", "unet", "film4", "film3")
        return self


VARIANTS = {
    # vae-gan.py:26-44
    "vanilla": VariantConfig(
        name="vanilla", text_encoder="sbert", generator="plain",
        enc_chans=(128, 256, 512, 1024), bottleneck_ch=1024,
        kl_weight=0.005, gan_weight=0.1, perc_weight=0.05,
        lr_g=1e-4, lr_d=1e-4, epochs=150, scheduler=None,
        full_loss_val=False,
    ),
    # vae-gan-lr-sh.py:30-55
    "lr_sh": VariantConfig(
        name="lr_sh", text_encoder="sbert", generator="plain",
        enc_chans=(128, 256, 512, 1024), bottleneck_ch=1024,
        kl_weight=0.001, gan_weight=0.1, perc_weight=0.2,
        lr_g=1e-4, lr_d=5e-5, epochs=200, scheduler=SchedulerConfig(),
        full_loss_val=True,
    ),
    # vae-gan-unet.py:30-56 (corrected decoder topology, see §2.9 of SURVEY.md)
    "unet": VariantConfig(
        name="unet", text_encoder="char", generator="unet",
        alphabet=ASCII_CYRILLIC_ALPHABET,
        enc_chans=(64, 128, 256, 512), bottleneck_ch=1024,
        kl_weight=0.001, gan_weight=0.15, perc_weight=0.1,
        lr_g=1e-4, lr_d=1e-4, epochs=200, scheduler=SchedulerConfig(),
        full_loss_val=False,
    ),
    # vae-gan-v2.py:26-61
    "v2": VariantConfig(
        name="v2", text_encoder="char", generator="film4",
        alphabet=ASCII_ALPHABET,
        enc_chans=(64, 128, 256, 512), bottleneck_ch=1024,
        kl_weight=0.001, gan_weight=0.15, perc_weight=0.1,
        kl_anneal_epochs=20, start_kl_weight=1e-7,
        lr_g=1e-4, lr_d=1e-4, epochs=200, scheduler=SchedulerConfig(),
        full_loss_val=True,
    ),
    # vae-gan-oldv.py:26-61
    "oldv": VariantConfig(
        name="oldv", text_encoder="char_posenc", generator="film3",
        alphabet=ASCII_ALPHABET, text_feature_height=4,
        enc_chans=(32, 64, 128), bottleneck_ch=256,
        kl_weight=0.001, gan_weight=0.07, perc_weight=0.2,
        kl_anneal_epochs=15, start_kl_weight=1e-7,
        lr_g=1e-4, lr_d=5e-5, epochs=200, scheduler=SchedulerConfig(),
        full_loss_val=True,
    ),
}


def get_config(name: str, **overrides) -> VariantConfig:
    """Variant config with overrides. Dotted keys reach into nested
    dataclasses: ``get_config("v2", **{"scheduler.patience": 5})`` —
    mirroring the reference's wandb.config sweep overrides of scheduler
    constants (vae-gan-lr-sh.py:43-47 read back at vae-gan-v2.py:857-867).
    """
    cfg = VARIANTS[name]
    if overrides:
        flat, nested = {}, {}
        for k, v in overrides.items():
            if "." in k:
                head, _, sub = k.partition(".")
                nested.setdefault(head, {})[sub] = v
            else:
                flat[k] = v
        for head, subs in nested.items():
            cur = flat.get(head, getattr(cfg, head))
            if cur is None:
                raise ValueError(
                    f"variant {name!r} has {head}=None; set the whole "
                    f"object before {head}.<field> overrides")
            flat[head] = dataclasses.replace(cur, **subs)
        cfg = dataclasses.replace(cfg, **flat)
    return cfg.validate()
