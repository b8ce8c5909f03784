"""The jitted GAN train/eval steps.

One compiled step reproduces the reference's per-batch schedule
(vae-gan.py:399-428) with the same information flow:

  1. one generator forward (captured with ``jax.vjp`` so its backward runs
     once, exactly like torch autograd reusing the forward's activations);
  2. discriminator update on (real, stop_gradient(fake)) —
     ``loss_D = 0.5 * (hinge(D(real), 1) + hinge(D(fake.detach()), 0))``;
  3. generator update *against the already-updated discriminator* (torch
     stepped opt_D before computing ``disc(fake)`` for the G loss) —
     ``loss_G = recon + w_kl * kl + w_gan * hinge_G + w_perc * perceptual``,
     gradients pulled back through the saved vjp, global-norm clipped.

Spectral-norm power-iteration vectors advance through the same sequence of
discriminator forwards as the reference (D-phase forwards, then the G-phase
forward on the updated weights). With ``cfg.fused_disc_forward`` the D-phase
runs real and fake through one concatenated forward (InstanceNorm is
per-sample, so activations are unchanged; only one power iteration happens
instead of two).

The KL weight is a traced scalar argument so KL annealing never recompiles.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from vae_gan_mark_tpu.config import VariantConfig
from vae_gan_mark_tpu.losses import (
    hinge_d_fake, hinge_d_real, hinge_g, kl_divergence, l1_loss,
    perceptual_loss)
from vae_gan_mark_tpu.models import PatchDiscriminator, VAEGANGenerator
from vae_gan_mark_tpu.train.state import (
    TrainState, make_d_optimizer, make_g_optimizer)

Batch = Dict[str, jnp.ndarray]  # keys: ru, en, mask, text


def build_train_step(cfg: VariantConfig):
    """Returns step(state, vgg_params, batch, rng, kl_weight) -> (state, metrics)."""
    g_model = VAEGANGenerator(cfg=cfg, train=True)
    d_model = PatchDiscriminator(
        cond_vocab=cfg.vocab_size if cfg.conditional_disc else 0)
    opt_g = make_g_optimizer(cfg)
    opt_d = make_d_optimizer(cfg)
    compute_dtype = jnp.dtype(cfg.compute_dtype)

    def d_apply(params, spectral, x, cond=None):
        out, updated = d_model.apply(
            {"params": params, "spectral": spectral}, x, cond,
            mutable=["spectral"])
        return out, updated["spectral"]

    def step(state: TrainState, vgg_params, batch: Batch, rng: jax.Array,
             kl_weight: jnp.ndarray) -> Tuple[TrainState, Dict[str, Any]]:
        rng = jax.random.fold_in(rng, state.step)
        rng_sample, rng_dropout = jax.random.split(rng)
        real = batch["en"]
        # Projection-conditional D (opt-in): real and fake are judged
        # against the SAME conditioning text; tokens carry no gradient.
        cond = batch["text"] if cfg.conditional_disc else None

        # ---- 1. Generator forward, backward saved for later. -------------
        def g_forward(g_params):
            (recon, mu, logvar), updated = g_model.apply(
                {"params": g_params, "batch_stats": state.g_batch_stats},
                batch["ru"], batch["mask"], batch["text"],
                eps=batch.get("eps"),  # None in production batches
                rngs={"sample": rng_sample, "dropout": rng_dropout},
                mutable=["batch_stats"])
            return (recon, mu, logvar), updated["batch_stats"]

        (fake, mu, logvar), g_vjp, new_g_batch_stats = jax.vjp(
            g_forward, state.g_params, has_aux=True)
        fake_sg = jax.lax.stop_gradient(fake)

        # ---- 2. Discriminator update. ------------------------------------
        def d_loss_fn(d_params):
            if cfg.fused_disc_forward:
                both = jnp.concatenate(
                    [real, fake_sg], axis=0).astype(compute_dtype)
                both_cond = (None if cond is None else
                             jnp.concatenate([cond, cond], axis=0))
                preds, spectral = d_apply(d_params, state.d_spectral, both,
                                          both_cond)
                real_preds, fake_preds = jnp.split(preds, 2, axis=0)
            else:
                real_preds, spectral = d_apply(
                    d_params, state.d_spectral, real.astype(compute_dtype),
                    cond)
                fake_preds, spectral = d_apply(
                    d_params, spectral, fake_sg.astype(compute_dtype), cond)
            loss = 0.5 * (hinge_d_real(real_preds) + hinge_d_fake(fake_preds))
            return loss, spectral

        (loss_d, d_spectral), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params)
        d_updates, new_opt_d = opt_d.update(d_grads, state.opt_d,
                                            state.d_params)
        new_d_params = optax.apply_updates(state.d_params, d_updates)

        # ---- 3. Generator update against the updated discriminator. ------
        def g_downstream(recon, mu_, logvar_):
            fake_preds, spectral = d_apply(
                new_d_params, d_spectral, recon.astype(compute_dtype), cond)
            recon_l = l1_loss(recon, real)
            kl = kl_divergence(mu_, logvar_)
            gan = hinge_g(fake_preds)
            perc = perceptual_loss(vgg_params, recon, real,
                                   dtype=compute_dtype)
            total = (cfg.recon_weight * recon_l + kl_weight * kl
                     + cfg.gan_weight * gan + cfg.perc_weight * perc)
            return total, (recon_l, kl, gan, perc, spectral)

        grad_fn = jax.value_and_grad(g_downstream, argnums=(0, 1, 2),
                                     has_aux=True)
        (loss_g, (recon_l, kl, gan, perc, d_spectral)), cotangents = grad_fn(
            fake, mu, logvar)
        (g_grads,) = g_vjp(cotangents)
        g_updates, new_opt_g = opt_g.update(g_grads, state.opt_g,
                                            state.g_params)
        new_g_params = optax.apply_updates(state.g_params, g_updates)

        new_state = state.replace(
            step=state.step + 1,
            g_params=new_g_params,
            g_batch_stats=new_g_batch_stats,
            d_params=new_d_params,
            d_spectral=d_spectral,
            opt_g=new_opt_g,
            opt_d=new_opt_d,
        )
        metrics = {
            "loss_G": loss_g, "loss_D": loss_d, "recon": recon_l,
            "kl": kl, "gan_g": gan, "perc": perc,
        }
        return new_state, metrics

    return step


def build_eval_step(cfg: VariantConfig):
    """Validation step, in the config's flavor (SURVEY.md §2.11):

    * ``cfg.full_loss_val`` (lr_sh/v2/oldv, vae-gan-v2.py:523-667): all five
      losses — G total, D loss, KL, GAN, perceptual — without updates.
    * recon-only (vanilla/unet, vae-gan.py:324-377): the reference's val
      loop computes ONLY the recon loss; mirroring its cost profile, the
      discriminator forwards and the VGG perceptual are skipped entirely
      (they were dead weight in the logged output anyway — the trainer
      gates those keys on ``full_loss_val``).

    Both flavors run eval-mode G (running BN stats, no dropout; the
    reference still samples z in eval — so do we) and report PSNR +
    the BASELINE.json round-trip metrics. Also returns the generated patch
    for image logging.
    """
    g_model = VAEGANGenerator(cfg=cfg, train=False)
    d_model = PatchDiscriminator(
        update_sn=False,
        cond_vocab=cfg.vocab_size if cfg.conditional_disc else 0)
    compute_dtype = jnp.dtype(cfg.compute_dtype)

    def step(state: TrainState, vgg_params, batch: Batch, rng: jax.Array,
             kl_weight: jnp.ndarray):
        # Callers fold a per-batch counter into ``rng`` so every val batch
        # draws fresh reparameterization noise (reference: randn per batch).
        rng_sample = jax.random.fold_in(rng, state.step)
        real = batch["en"]
        (fake, mu, logvar) = g_model.apply(
            {"params": state.g_params, "batch_stats": state.g_batch_stats},
            batch["ru"], batch["mask"], batch["text"],
            rngs={"sample": rng_sample})
        recon_l = l1_loss(fake, real)
        kl = kl_divergence(mu, logvar)
        mse = jnp.mean(jnp.square(fake - real))
        psnr = -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))
        # BASELINE.json round-trip metrics: text-region-restricted error and
        # mark-recovery rate (fraction of masked pixels within tolerance).
        from vae_gan_mark_tpu.eval import mark_recovery_rate, masked_l1
        m_l1 = masked_l1(fake, real, batch["mask"])
        recovery = mark_recovery_rate(fake, real, batch["mask"])
        metrics = {
            "recon": recon_l, "kl": kl, "psnr": psnr,
            "masked_l1": m_l1, "mark_recovery": recovery,
        }
        if cfg.full_loss_val:
            cond = batch["text"] if cfg.conditional_disc else None
            fake_preds = d_model.apply(
                {"params": state.d_params, "spectral": state.d_spectral},
                fake.astype(compute_dtype), cond)
            real_preds = d_model.apply(
                {"params": state.d_params, "spectral": state.d_spectral},
                real.astype(compute_dtype), cond)
            gan = hinge_g(fake_preds)
            loss_d = 0.5 * (hinge_d_real(real_preds)
                            + hinge_d_fake(fake_preds))
            perc = perceptual_loss(vgg_params, fake, real,
                                   dtype=compute_dtype)
            total = (cfg.recon_weight * recon_l + kl_weight * kl
                     + cfg.gan_weight * gan + cfg.perc_weight * perc)
            metrics.update({"gan_g": gan, "perc": perc,
                            "loss_G": total, "loss_D": loss_d})
        return metrics, fake

    return step


def build_multi_train_step(cfg: VariantConfig):
    """K train steps in ONE dispatch via ``lax.scan``.

    ``batches`` holds stacked arrays with a leading steps axis of size K
    (stack K host batches with ``np.stack``). Semantics are identical to K
    sequential ``build_train_step`` calls — the per-step RNG folds
    ``state.step``, which advances inside the scan — so this is a pure
    dispatch-latency optimization: at the reference's batch 16 the step
    computes ~25 ms of work but a tunneled/remote chip pays a host
    round-trip per dispatch; scanning K steps amortizes it. Returns the
    new state and metrics averaged over the K steps (matching how the
    epoch driver averages per-step metrics).
    """
    single = build_train_step(cfg)

    def step(state: TrainState, vgg_params, batches: Batch, rng: jax.Array,
             kl_weight: jnp.ndarray):
        def body(carry, batch):
            new_state, metrics = single(carry, vgg_params, batch, rng,
                                        kl_weight)
            return new_state, metrics
        state, metrics = jax.lax.scan(body, state, batches)
        return state, jax.tree.map(lambda m: jnp.mean(m, axis=0), metrics)

    return step


def build_multi_eval_step(cfg: VariantConfig):
    """K eval-step batches in ONE dispatch via ``lax.scan``.

    ``batches`` carries a leading K axis; ``idxs`` (shape (K,)) are the
    global val-batch indices the sequential path would have folded into the
    rng (train/loop.py folds ``batch_idx`` per batch) — so metrics equal K
    sequential ``build_eval_step`` calls exactly. Returns per-step stacked
    metrics (callers weight by batch size) and the FIRST batch's generated
    patches (the only ones the epoch driver ever consumes: the <=16 logged
    triplets come from val batch 0).
    """
    single = build_eval_step(cfg)

    def step(state: TrainState, vgg_params, batches: Batch,
             idxs: jnp.ndarray, rng: jax.Array, kl_weight: jnp.ndarray):
        k = idxs.shape[0]
        b, h, w = (batches["ru"].shape[1], batches["ru"].shape[2],
                   batches["ru"].shape[3])
        fake0 = jnp.zeros((b, h, w, 3), jnp.float32)

        def body(carry, xs):
            batch, local_i, idx = xs
            metrics, fake = single(state, vgg_params, batch,
                                   jax.random.fold_in(rng, idx), kl_weight)
            carry = jnp.where(local_i == 0, fake.astype(jnp.float32), carry)
            return carry, metrics

        fake0, metrics = jax.lax.scan(
            body, fake0, (batches, jnp.arange(k), idxs))
        return metrics, fake0

    return step


def jit_train_step(cfg: VariantConfig):
    return jax.jit(build_train_step(cfg), donate_argnums=(0,))


def jit_multi_train_step(cfg: VariantConfig):
    # Only the state is donated: callers may legitimately reuse a stacked
    # batch across dispatches (benchmarks), and batches are small next to
    # the training state.
    return jax.jit(build_multi_train_step(cfg), donate_argnums=(0,))


def jit_eval_step(cfg: VariantConfig):
    return jax.jit(build_eval_step(cfg))


def jit_multi_eval_step(cfg: VariantConfig):
    return jax.jit(build_multi_eval_step(cfg))
