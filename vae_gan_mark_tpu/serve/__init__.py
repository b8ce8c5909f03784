"""Serving: a compiled inference engine over a trained generator.

The reference has no serving path — inference means running ``model(...)``
inside the training script. Here serving is a first-class component:

* ``InferenceEngine`` — loads a checkpoint, jits an eval-mode generator
  forward at fixed batch size (static shapes; padded partial batches), and
  exposes:
    - ``generate(ru, mask, texts)``     -> EN patches (B, H, W, 3)
    - ``render(image, mask, quad, text)`` -> full image with the region
      re-rendered (crop -> generate -> perspective paste-back)
* deterministic sampling (fixed or caller-provided RNG), bf16 compute by
  default, one warmup compile at construction.
"""

from vae_gan_mark_tpu.serve.engine import InferenceEngine  # noqa: F401
