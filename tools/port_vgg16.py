"""Offline converter: torchvision VGG16 IMAGENET1K_V1 -> tools/vgg16_features.npz.

Two ways to run it:

    # On a machine with torchvision + the checkpoint cached:
    python tools/port_vgg16.py [--out tools/vgg16_features.npz]

    # From a torch-saved state dict (no torchvision needed — e.g. a file
    # produced elsewhere by torch.save(vgg16(...).state_dict(), path)):
    python tools/port_vgg16.py --state-dict vgg16.pth

Extracts the 7 conv layers of ``features[:16]`` (conv1_1 .. conv3_3 — the
reference's perceptual trunk, /root/reference/vae-gan.py:300-311), writes
kernels transposed to HWIO (NHWC conv layout) plus biases. The framework's
perceptual loss (vae_gan_mark_tpu/models/vgg.py) picks the file up
automatically; without it a fixed-seed random init is used.
"""

import argparse
import os

import numpy as np

# Conv2d positions inside torchvision vgg16().features[:16]
# (0 Conv, 1 ReLU, 2 Conv, 3 ReLU, 4 MaxPool, 5 Conv, ... 14 Conv, 15 ReLU).
VGG16_FEATURES_CONV_INDICES = (0, 2, 5, 7, 10, 12, 14)
VGG16_FEATURES_CONV_WIDTHS = (64, 64, 128, 128, 256, 256, 256)


def convert_state_dict(state_dict) -> dict:
    """torchvision-format VGG16 state dict -> npz array dict.

    Accepts either full-model keys (``features.0.weight``) or keys from
    ``model.features[:16].state_dict()`` (``0.weight``). Values may be torch
    tensors or numpy arrays in torch's OIHW layout; kernels come out HWIO.
    """
    prefix = "features." if any(k.startswith("features.")
                                for k in state_dict) else ""
    arrays = {}
    for i, idx in enumerate(VGG16_FEATURES_CONV_INDICES):
        w = np.asarray(state_dict[f"{prefix}{idx}.weight"])  # (out,in,kh,kw)
        b = np.asarray(state_dict[f"{prefix}{idx}.bias"])
        out_ch = VGG16_FEATURES_CONV_WIDTHS[i]
        assert w.shape == (out_ch, 3 if i == 0 else
                           VGG16_FEATURES_CONV_WIDTHS[i - 1], 3, 3), \
            (i, w.shape)
        assert b.shape == (out_ch,), (i, b.shape)
        arrays[f"conv{i}_kernel"] = np.transpose(
            w.astype(np.float32), (2, 3, 1, 0))
        arrays[f"conv{i}_bias"] = b.astype(np.float32)
    return arrays


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "vgg16_features.npz"))
    ap.add_argument("--state-dict", default=None,
                    help="path to a torch.save'd VGG16 state dict "
                         "(full-model or features[:16] keys); when absent, "
                         "torchvision downloads IMAGENET1K_V1")
    args = ap.parse_args(argv)

    if args.state_dict:
        import torch
        sd = torch.load(args.state_dict, map_location="cpu",
                        weights_only=True)
        sd = {k: v.numpy() if hasattr(v, "numpy") else v
              for k, v in sd.items()}
    else:
        from torchvision.models import vgg16, VGG16_Weights
        model = vgg16(weights=VGG16_Weights.IMAGENET1K_V1)
        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    arrays = convert_state_dict(sd)
    np.savez(args.out, **arrays)
    print(f"wrote {len(arrays) // 2} conv layers to {args.out}")


if __name__ == "__main__":
    main()
