"""Host-side schedules: ReduceLROnPlateau and KL annealing.

Both are epoch-granularity host logic (exactly like the reference); the
resulting scalars are fed into the jitted step (KL weight) or written into
the optimizer's injected hyperparams (learning rate), so neither triggers a
recompile.
"""

from __future__ import annotations

import dataclasses

from vae_gan_mark_tpu.config import SchedulerConfig, VariantConfig


@dataclasses.dataclass
class PlateauState:
    """Mutable state of one ReduceLROnPlateau instance (mode='min',
    threshold_mode='rel', cooldown=0 — torch defaults as used by
    vae-gan-lr-sh.py:630-634)."""

    best: float = float("inf")
    num_bad_epochs: int = 0


def plateau_step(cfg: SchedulerConfig, state: PlateauState, metric: float,
                 lr: float) -> float:
    """Advance the scheduler with this epoch's metric; returns the new LR.

    torch semantics: an epoch is "good" if metric < best * (1 - threshold)
    (relative threshold, min mode). After more than ``patience`` consecutive
    bad epochs the LR is multiplied by ``factor`` (floored at ``min_lr``)
    and the bad-epoch counter resets.
    """
    if metric < state.best * (1.0 - cfg.threshold):
        state.best = metric
        state.num_bad_epochs = 0
    else:
        state.num_bad_epochs += 1
    if state.num_bad_epochs > cfg.patience:
        state.num_bad_epochs = 0
        return max(lr * cfg.factor, cfg.min_lr)
    return lr


def kl_weight_for_epoch(cfg: VariantConfig, epoch: int) -> float:
    """Linear KL anneal (vae-gan-v2.py:1003-1005): for epoch < anneal_epochs,
    weight = start + (target - start) * epoch / (anneal_epochs - 1);
    afterwards the target weight. With kl_anneal_epochs == 0 the weight is
    constant (vanilla/lr_sh/unet variants)."""
    if cfg.kl_anneal_epochs <= 0 or epoch >= cfg.kl_anneal_epochs:
        return cfg.kl_weight
    denom = max(1, cfg.kl_anneal_epochs - 1)
    return cfg.start_kl_weight + (
        cfg.kl_weight - cfg.start_kl_weight) * (epoch / denom)
