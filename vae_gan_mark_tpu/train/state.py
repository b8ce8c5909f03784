"""Training state: generator + discriminator params/state + two optimizers.

The reference keeps two torch Adam optimizers (betas (0.5, 0.999)) over the
generator and discriminator respectively (vae-gan.py:541-542), with global-norm
grad clipping (1.0) applied to the generator only (vae-gan.py:424). Learning
rates are runtime-adjustable (ReduceLROnPlateau steps them between epochs), so
both optimizers are built with ``optax.inject_hyperparams`` and the epoch
driver rewrites ``opt_state.hyperparams['learning_rate']`` — no recompiles.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from vae_gan_mark_tpu.config import VariantConfig
from vae_gan_mark_tpu.models import PatchDiscriminator, VAEGANGenerator


def make_g_optimizer(cfg: VariantConfig) -> optax.GradientTransformation:
    def factory(learning_rate):
        return optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip_norm),
            optax.adam(learning_rate, b1=cfg.adam_b1, b2=cfg.adam_b2),
        )
    return optax.inject_hyperparams(factory)(learning_rate=cfg.lr_g)


def make_d_optimizer(cfg: VariantConfig) -> optax.GradientTransformation:
    def factory(learning_rate):
        return optax.adam(learning_rate, b1=cfg.adam_b1, b2=cfg.adam_b2)
    return optax.inject_hyperparams(factory)(learning_rate=cfg.lr_d)


class TrainState(struct.PyTreeNode):
    """Pure pytree of everything a train step reads/writes."""

    step: jnp.ndarray
    g_params: Any
    g_batch_stats: Any
    d_params: Any
    d_spectral: Any
    opt_g: Any
    opt_d: Any


def get_lr(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def set_lr(opt_state, lr: float):
    hp = dict(opt_state.hyperparams)
    old = hp["learning_rate"]
    new = jnp.asarray(lr, jnp.float32)
    if jax.process_count() > 1 and isinstance(old, jax.Array):
        # Keep the replicated global sharding of the array being replaced:
        # a plain single-device scalar here would make the optimizer state
        # unserializable in multi-host checkpointing (orbax refuses
        # host-local arrays) and would de-replicate the jitted step's
        # input sharding.
        import numpy as np
        shards = [jax.device_put(np.asarray(lr, np.float32), d)
                  for d in old.sharding.addressable_devices]
        new = jax.make_array_from_single_device_arrays(
            (), old.sharding, shards)
    hp["learning_rate"] = new
    return opt_state._replace(hyperparams=hp)


def create_train_state(cfg: VariantConfig, rng: jax.Array,
                       sample_batch) -> TrainState:
    """Initialize G, D, and both optimizer states from a sample batch."""
    g_model = VAEGANGenerator(cfg=cfg, train=True)
    d_model = PatchDiscriminator(
        cond_vocab=cfg.vocab_size if cfg.conditional_disc else 0)
    rng_g, rng_d, rng_s, rng_do = jax.random.split(rng, 4)
    g_vars = g_model.init(
        {"params": rng_g, "sample": rng_s, "dropout": rng_do},
        sample_batch["ru"], sample_batch["mask"], sample_batch["text"])
    d_vars = d_model.init(
        rng_d, sample_batch["en"],
        sample_batch["text"] if cfg.conditional_disc else None)
    opt_g = make_g_optimizer(cfg)
    opt_d = make_d_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_vars["params"],
        g_batch_stats=g_vars.get("batch_stats", {}),
        d_params=d_vars["params"],
        d_spectral=d_vars.get("spectral", {}),
        opt_g=opt_g.init(g_vars["params"]),
        opt_d=opt_d.init(d_vars["params"]),
    )


def count_params(tree) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(tree))
