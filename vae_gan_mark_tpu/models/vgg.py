"""VGG16 feature extractor for the perceptual loss.

The reference uses torchvision VGG16 (IMAGENET1K_V1) ``features[:16]`` — i.e.
conv1_1 .. relu3_3 with two max-pools — in eval mode with ImageNet
normalization (vae-gan.py:300-311). torchvision is not available in this
environment (and there is no network egress to fetch weights), so:

* the architecture is reproduced exactly (7 convs, k3 p1, ReLU, 2 pools);
* weights load from ``tools/vgg16_features.npz`` when that file exists
  (produced offline by ``tools/port_vgg16.py`` from a torchvision
  checkpoint);
* otherwise a fixed-seed random init is used. A frozen random conv pyramid
  still yields a meaningful structural/perceptual gradient signal (random
  VGG features are an established perceptual-metric baseline), and the loss
  weight/plumbing are identical — but PSNR-parity comparisons against the
  reference must either port real weights or disable the perceptual term on
  both sides.

Unlike the reference — which reloads VGG16 from disk at the start of every
epoch inside ``train_loop`` (vae-gan.py:386) — the parameters are built once
and passed into the jitted train step.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# features[:16]: channel widths per conv, "M" = 2x2 max pool.
VGG16_HEAD_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256)

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

DEFAULT_WEIGHTS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
    "tools", "vgg16_features.npz")


class VGG16Features(nn.Module):
    """NHWC [0,1] image -> relu3_3 feature map; ImageNet normalize inside."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
        std = jnp.asarray(IMAGENET_STD, x.dtype)
        x = (x - mean) / std
        x = x.astype(self.dtype)
        conv_idx = 0
        for c in VGG16_HEAD_CFG:
            if c == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                from vae_gan_mark_tpu.ops.precision import precision_for
                x = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)),
                            precision=precision_for(self.dtype),
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"conv{conv_idx}")(x)
                x = nn.relu(x)
                conv_idx += 1
        return x


def load_vgg_params(path: str = DEFAULT_WEIGHTS_PATH,
                    dtype: Any = jnp.float32):
    """Build the (frozen) VGG parameter tree.

    Loads ported torchvision weights from ``path`` if present (npz with keys
    ``conv{i}_kernel`` HWIO and ``conv{i}_bias``), else fixed-seed random.
    """
    model = VGG16Features(dtype=dtype)
    variables = model.init(jax.random.PRNGKey(16), jnp.zeros((1, 32, 32, 3)))
    params = variables["params"]
    if os.path.exists(path):
        data = np.load(path)
        new = {}
        for name in params:  # conv0..conv6 (7 convs in features[:16])
            new[name] = {
                "kernel": jnp.asarray(data[f"{name}_kernel"]),
                "bias": jnp.asarray(data[f"{name}_bias"]),
            }
        params = new
    return params


def vgg_features(params, x, dtype: Any = jnp.float32):
    return VGG16Features(dtype=dtype).apply({"params": params}, x)
