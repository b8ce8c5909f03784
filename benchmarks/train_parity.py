"""Training-trajectory parity: this framework vs a from-spec torch v2.

The round-1 parity evidence covered *forward outputs* only; this harness
proves the training dynamics match. Protocol (the "symmetric perceptual"
variant — VGG weights are identical on both sides, ported from the torch
init, so the comparison is exact even without torchvision's pretrained
checkpoint):

  1. build the from-spec torch v2 (benchmarks/reference_baseline.py: same
     op sequence and hyperparameters as /root/reference/vae-gan-v2.py),
     GRU dropout 0 (the only non-determinism that cannot be synchronized
     across frameworks);
  2. port generator weights (port_v2_generator), discriminator weights
     *including the spectral-norm power-iteration u vectors*
     (port_discriminator), and the perceptual head (port_vgg_head) into the
     JAX models — identical f32 init on both sides;
  3. run N steps of each implementation's real production step
     (torch: the reference's D-then-G schedule, vae-gan-v2.py:696-740;
     JAX: train/step.py with fused_disc_forward=False so the
     power-iteration sequence matches torch's three D forwards per step)
     on identical synthetic batches with identical reparameterization
     noise, Adam(0.5, 0.999) lr 1e-4 both sides, G-only clip 1.0,
     KL weight 1e-3;
  4. record per-step losses on both sides; report max/mean relative
     deviation of each loss curve.

Run: python benchmarks/train_parity.py [--steps 200] [--batch 16]
Writes benchmarks/train_parity.json (consumed by PARITY_TRAIN.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def torch_side(cfg, steps, batches, eps_list, kl_w=1e-3, gan_w=0.15,
               perc_w=0.1, perturb=0.0):
    """``perturb``: relative perturbation applied to one generator weight
    after init — used by the --control mode to measure the *chaotic
    self-divergence* of the training dynamics (GAN steps amplify 1-ulp
    differences), the yardstick against which torch-vs-JAX deviation is
    judged."""
    import torch
    import torch.nn.functional as F
    from torch.nn.utils import clip_grad_norm_
    from benchmarks.reference_baseline import Disc, Gen, VGGHead

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 1)
    full = cfg.patch_w == 448 and cfg.bottleneck_ch == 1024
    gen = Gen(dropout=0.0, cfg=None if full else cfg)
    disc, vgg = Disc(), VGGHead()
    opt_g = torch.optim.Adam(gen.parameters(), 1e-4, betas=(0.5, 0.999))
    opt_d = torch.optim.Adam(disc.parameters(), 1e-4, betas=(0.5, 0.999))
    # Snapshot the INITIAL weights — training below mutates the modules in
    # place, and the JAX side must start from the same init, not the
    # torch-trained result.
    from benchmarks.reference_baseline import renamed_state_dict
    init = {
        "gen_sd": {k: v.clone() for k, v in
                   renamed_state_dict(gen).items()},
        "disc_sd": {k: v.clone() for k, v in disc.state_dict().items()},
        "vgg_sd": {k: v.clone() for k, v in vgg.state_dict().items()},
    }
    if perturb:
        with torch.no_grad():
            p = next(gen.enc.parameters())
            p.mul_(1.0 + perturb)

    history = []
    for i in range(steps):
        b = batches[i % len(batches)]
        img = torch.tensor(np.transpose(b["ru"], (0, 3, 1, 2)))
        mask = torch.tensor(np.transpose(b["mask"], (0, 3, 1, 2)))
        target = torch.tensor(np.transpose(b["en"], (0, 3, 1, 2)))
        tokens = torch.tensor(b["text"], dtype=torch.long)
        eps = torch.tensor(np.transpose(eps_list[i], (0, 3, 1, 2)))

        fake, mu, logvar = gen(img, mask, tokens, eps=eps)
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
        loss_g = recon + kl_w * kl + gan_w * gan + perc_w * perc
        loss_g.backward()
        clip_grad_norm_(gen.parameters(), 1.0)
        opt_g.step()
        history.append({"loss_G": float(loss_g), "loss_D": float(loss_d),
                        "recon": float(recon), "kl": float(kl),
                        "gan_g": float(gan), "perc": float(perc)})
    return init, history


def jax_side(init, cfg, steps, batches, eps_list, kl_w=1e-3):
    import jax
    import jax.numpy as jnp
    from vae_gan_mark_tpu.train.state import create_train_state
    from vae_gan_mark_tpu.train.step import jit_train_step
    from vae_gan_mark_tpu.utils.port_torch import (
        port_discriminator, port_v2_generator, port_vgg_head)

    g_params, g_stats = port_v2_generator(init["gen_sd"], cfg)
    d_params, d_spectral = port_discriminator(init["disc_sd"])
    vgg_params = port_vgg_head(init["vgg_sd"])

    init_batch = {k: jnp.asarray(v) for k, v in batches[0].items()
                  if k != "raw_text"}
    state = create_train_state(cfg, jax.random.PRNGKey(0), init_batch)
    state = state.replace(
        g_params=jax.tree.map(jnp.asarray, g_params),
        g_batch_stats=jax.tree.map(jnp.asarray, g_stats),
        d_params=jax.tree.map(jnp.asarray, d_params),
        d_spectral=jax.tree.map(jnp.asarray, d_spectral))
    # Optimizer states were initialized against the same tree structure
    # (Adam moments start at zero either way).
    step = jit_train_step(cfg)
    vgg_params = jax.tree.map(jnp.asarray, vgg_params)

    history = []
    rng = jax.random.PRNGKey(1)  # unused: eps supplied, dropout 0
    for i in range(steps):
        b = batches[i % len(batches)]
        batch = {k: jnp.asarray(v) for k, v in b.items() if k != "raw_text"}
        batch["eps"] = jnp.asarray(eps_list[i])
        state, m = step(state, vgg_params, batch, rng, jnp.float32(kl_w))
        history.append({k: float(v) for k, v in m.items()})
    return history


def compare(hist_t, hist_j):
    keys = ["loss_G", "loss_D", "recon", "kl", "gan_g", "perc"]
    report = {}
    for k in keys:
        a = np.array([h[k] for h in hist_t])
        b = np.array([h[k] for h in hist_j])
        scale = np.maximum(np.abs(a), 1e-3)
        rel = np.abs(a - b) / scale
        report[k] = {
            "torch_first": float(a[0]), "jax_first": float(b[0]),
            "torch_last": float(a[-1]), "jax_last": float(b[-1]),
            "max_rel_dev": float(rel.max()),
            "mean_rel_dev": float(rel.mean()),
            "last10_rel_dev": float(rel[-10:].mean()),
        }
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n-batches", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "train_parity.json"))
    ap.add_argument("--control", action="store_true",
                    help="also run torch vs perturbed-torch to measure "
                         "chaotic self-divergence")
    ap.add_argument("--scale", choices=("tiny", "full"), default="tiny",
                    help="'tiny' shrinks every width (op sequence is "
                         "identical; a full-size torch step costs ~4 min "
                         "on a 1-core host). Full-resolution *forward* "
                         "parity is covered by tests/test_torch_parity.py.")
    args = ap.parse_args()

    from vae_gan_mark_tpu.config import get_config
    from vae_gan_mark_tpu.data.synthetic import SyntheticPatchDataset

    scale_kw = {} if args.scale == "full" else dict(
        patch_h=32, patch_w=64, enc_chans=(8, 16, 24, 32), bottleneck_ch=48,
        z_ch=16, char_emb_dim=16, char_rnn_hidden=16, max_text_len=12)
    cfg = get_config("v2", compute_dtype="float32", char_rnn_dropout=0.0,
                     fused_disc_forward=False, batch_size=args.batch,
                     **scale_kw)
    ds = SyntheticPatchDataset(cfg, num_samples=args.batch * args.n_batches,
                               seed=0)
    batches = [ds.batch(args.batch, i) for i in range(args.n_batches)]
    rng = np.random.default_rng(42)
    eps_list = [rng.normal(0, 1, (args.batch, 1, 1, cfg.z_ch))
                .astype(np.float32) for _ in range(args.steps)]

    t0 = time.time()
    init, hist_t = torch_side(cfg, args.steps, batches, eps_list)
    t_torch = time.time() - t0
    print(f"torch side: {args.steps} steps in {t_torch:.1f}s")

    control = None
    if args.control:
        # Chaos yardstick: the SAME torch implementation with a 1e-7
        # relative perturbation of one weight. Its divergence from the
        # unperturbed run bounds what "identical dynamics" can look like
        # after N GAN steps in float32.
        _, hist_c = torch_side(cfg, args.steps, batches, eps_list,
                               perturb=1e-7)
        control = compare(hist_t, hist_c)
        print("control (torch vs torch+1e-7 perturbation) computed")

    t0 = time.time()
    hist_j = jax_side(init, cfg, args.steps, batches, eps_list)
    t_jax = time.time() - t0
    print(f"jax side:   {args.steps} steps in {t_jax:.1f}s")

    report = compare(hist_t, hist_j)
    out = {
        "protocol": "identical ported f32 init (G+D+VGG incl. spectral u), "
                    "identical batches + reparam noise, dropout 0, "
                    "fused_disc_forward off, Adam(0.5,0.999) lr 1e-4, "
                    "kl_w 1e-3",
        "steps": args.steps, "batch": args.batch, "scale": args.scale,
        "losses": report,
        "control_chaos_yardstick": control,
        "torch_history": hist_t, "jax_history": hist_j,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: {kk: vv for kk, vv in v.items()
                          if "dev" in kk} for k, v in report.items()},
                     indent=2))


if __name__ == "__main__":
    main()
