"""Convert a reference training checkpoint (.pth) into this framework.

    python tools/port_reference_checkpoint.py last_checkpoint.pth out.npz \
        [--variant v2]

Reads the torch checkpoint dict the reference saves (vae-gan-v2.py:801-810),
ports ``model_state_dict`` via utils/port_torch.py, and writes a flat npz of
generator params + batch stats. Load for serving with:

    from vae_gan_mark_tpu.serve import InferenceEngine
    from tools.port_reference_checkpoint import load_ported
    params, batch_stats = load_ported("out.npz")
    engine = InferenceEngine(get_config("v2"), params, batch_stats)
"""

import argparse
import sys

import numpy as np


def flatten(tree, prefix=""):
    out = {}
    for key, val in tree.items():
        path = f"{prefix}{key}"
        if isinstance(val, dict):
            out.update(flatten(val, path + "/"))
        else:
            out[path] = np.asarray(val)
    return out


def unflatten(flat):
    tree = {}
    for path, val in flat.items():
        parts = path.split("/")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = val
    return tree


def load_ported(path):
    data = np.load(path)
    params_flat = {k[len("params/"):]: data[k] for k in data.files
                   if k.startswith("params/")}
    stats_flat = {k[len("batch_stats/"):]: data[k] for k in data.files
                  if k.startswith("batch_stats/")}
    return unflatten(params_flat), unflatten(stats_flat)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("out")
    ap.add_argument("--variant", default="v2")
    args = ap.parse_args()

    import torch
    sys.path.insert(0, ".")
    from vae_gan_mark_tpu.config import get_config
    from vae_gan_mark_tpu.utils.port_torch import port_generator

    ckpt = torch.load(args.checkpoint, map_location="cpu")
    sd = ckpt.get("model_state_dict", ckpt)
    cfg = get_config(args.variant)
    params, batch_stats = port_generator(sd, cfg)
    arrays = {}
    arrays.update({f"params/{k}": v for k, v in flatten(params).items()})
    arrays.update({f"batch_stats/{k}": v
                   for k, v in flatten(batch_stats).items()})
    np.savez(args.out, **arrays)
    print(f"ported {len(arrays)} arrays -> {args.out}")


if __name__ == "__main__":
    main()
