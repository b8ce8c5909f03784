"""vae_gan_mark_tpu — a TPU-native JAX/Flax framework with the capabilities of
the ``Andrey1408/vae-gan-mark`` reference (conditional text re-rendering in
marketing images via VAE-GAN).

Layout conventions
------------------
* Images are **NHWC** (TPU-native), float in [0, 1]. The reference uses NCHW
  torch tensors; this framework is not a port — shapes and semantics match,
  memory layout is chosen for XLA/TPU.
* Patches are (H=64, W=448) by default (reference ``PATCH_SHAPE = (448, 64)``
  is (W, H), see /root/reference/vae-gan.py:31).
* All model code is functional (flax.linen); mutable state lives in explicit
  variable collections: ``params``, ``batch_stats`` (BatchNorm running stats),
  ``spectral`` (spectral-norm power-iteration vectors).
"""

__version__ = "0.1.0"

from vae_gan_mark_tpu.config import VariantConfig, VARIANTS, get_config  # noqa: F401
