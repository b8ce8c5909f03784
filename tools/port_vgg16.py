"""Offline converter: torchvision VGG16 IMAGENET1K_V1 -> tools/vgg16_features.npz.

Run on any machine that has torchvision + the checkpoint cached:

    python tools/port_vgg16.py [--out tools/vgg16_features.npz]

Extracts the 7 conv layers of ``features[:16]`` (conv1_1 .. conv3_3), writes
kernels transposed to HWIO (NHWC conv layout) plus biases. The framework's
perceptual loss (vae_gan_mark_tpu/models/vgg.py) picks the file up
automatically; without it a fixed-seed random init is used.
"""

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "vgg16_features.npz"))
    args = ap.parse_args()

    from torchvision.models import vgg16, VGG16_Weights
    model = vgg16(weights=VGG16_Weights.IMAGENET1K_V1).features[:16].eval()

    arrays = {}
    conv_idx = 0
    for layer in model:
        if layer.__class__.__name__ == "Conv2d":
            w = layer.weight.detach().numpy()     # (out, in, kh, kw)
            arrays[f"conv{conv_idx}_kernel"] = np.transpose(w, (2, 3, 1, 0))
            arrays[f"conv{conv_idx}_bias"] = layer.bias.detach().numpy()
            conv_idx += 1
    assert conv_idx == 7, conv_idx  # 64,64 | 128,128 | 256,256,256
    np.savez(args.out, **arrays)
    print(f"wrote {conv_idx} conv layers to {args.out}")


if __name__ == "__main__":
    main()
