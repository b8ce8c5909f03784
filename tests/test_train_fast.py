"""Fast-tier train-step smoke: tiny-config loss-decrease, bitwise resume,
and spectral/BN state advancement.

test_train.py keeps the broad slow-tier integration matrix; this file gives
``pytest -m fast`` real train-step coverage with exactly two tiny-config
compiles (one default-loss, one pure-VAE) and short step counts.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vae_gan_mark_tpu.config import get_config
from vae_gan_mark_tpu.data.synthetic import device_batch, SyntheticPatchDataset
from vae_gan_mark_tpu.models.vgg import load_vgg_params
from vae_gan_mark_tpu.train.checkpoint import (
    restore_checkpoint, save_checkpoint)
from vae_gan_mark_tpu.train.schedule import PlateauState
from vae_gan_mark_tpu.train.state import create_train_state
from vae_gan_mark_tpu.train.step import jit_train_step

TINY = dict(patch_h=32, patch_w=64, compute_dtype="float32",
            enc_chans=(8, 16, 24, 32), bottleneck_ch=48, z_ch=16,
            char_emb_dim=16, char_rnn_hidden=16, max_text_len=12,
            batch_size=8)


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("v2", **TINY)
    ds = SyntheticPatchDataset(cfg, num_samples=64, seed=0)
    batch0 = device_batch(ds.batch(8, 0))
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch0)
    return cfg, ds, state, load_vgg_params()


def test_step_advances_spectral_and_bn_state(setup):
    cfg, ds, state, vgg = setup
    # The step donates its input state (donate_argnums): on backends where
    # donation is real (TPU) the fixture's buffers would be deleted for
    # every later test — step a private copy.
    state = jax.tree.map(jnp.array, state)
    step = jit_train_step(cfg)
    u_before = jax.tree.map(np.asarray, state.d_spectral)
    bs_before = jax.tree.map(np.asarray, state.g_batch_stats)
    state, m = step(state, vgg, device_batch(ds.batch(8, 0)),
                    jax.random.PRNGKey(1), jnp.float32(1e-4))
    for k, v in m.items():
        assert np.isfinite(float(v)), (k, float(v))
    changed_u = jax.tree.map(lambda a, b: not np.allclose(a, np.asarray(b)),
                             u_before, state.d_spectral)
    assert any(jax.tree.leaves(changed_u)), "spectral u must advance"
    changed_bs = jax.tree.map(lambda a, b: not np.allclose(a, np.asarray(b)),
                              bs_before, state.g_batch_stats)
    assert any(jax.tree.leaves(changed_bs)), "BN running stats must update"


def test_resume_is_bitwise(setup, tmp_path):
    cfg, ds, state, vgg = setup
    state = jax.tree.map(jnp.array, state)  # private copy (step donates)
    step = jit_train_step(cfg)  # cached from the test above
    rng = jax.random.PRNGKey(3)

    def advance(s, start, n):
        m = None
        for i in range(start, start + n):
            s, m = step(s, vgg, device_batch(ds.batch(8, i)), rng,
                        jnp.float32(1e-4))
        return s, m

    state, _ = advance(state, 0, 2)
    save_checkpoint(str(tmp_path), "ck", state, epoch=0, best_val=1.0,
                    sched_g=PlateauState(), sched_d=PlateauState(),
                    lr_g=1e-4, lr_d=1e-4)
    # Restore BEFORE the continuation step donates `state`'s buffers.
    restored, meta = restore_checkpoint(str(tmp_path), "ck", state)
    cont_state, cont_m = advance(state, 2, 2)
    res_state, res_m = advance(restored, 2, 2)
    for k in cont_m:
        assert float(cont_m[k]) == pytest.approx(float(res_m[k]),
                                                 rel=1e-6), k
    for a, b in zip(jax.tree.leaves(cont_state.g_params),
                    jax.tree.leaves(res_state.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_multi_step_matches_sequential(tmp_path):
    """Trainer(multi_step=4) over 10 batches (2 scanned dispatches + a
    2-batch single-step leftover) must match the sequential Trainer: same
    final params, same epoch-average metrics."""
    from vae_gan_mark_tpu.train.loop import Trainer

    cfg = get_config("v2", epochs=1, **TINY)
    ds = SyntheticPatchDataset(cfg, num_samples=64, seed=0)
    steps = 10

    def data(epoch):
        for i in range(steps):
            yield ds.batch(8, i)

    t_seq = Trainer(cfg, data, data, workdir=str(tmp_path / "seq"), seed=0)
    v_seq = t_seq.validate(0)   # identical fresh init on both trainers:
    m_seq = t_seq.train_epoch(0)  # val metrics must match near-bitwise
    t_multi = Trainer(cfg, data, data, workdir=str(tmp_path / "multi"),
                      seed=0, multi_step=4)
    v_multi = t_multi.validate(0)  # 2 scanned groups + 2-batch leftover
    m_multi = t_multi.train_epoch(0)

    for k in v_seq:
        assert v_multi[k] == pytest.approx(v_seq[k], rel=1e-5, abs=1e-6), k

    # Tolerances sit above the scan-vs-unrolled fusion jitter compounded
    # through 10 chaotic GAN steps (measured rel ~1.3e-4 on loss_G) and far
    # below any same-step semantic difference (different batch order / RNG
    # would move these by ~1e-1).
    for k in ("loss_G", "loss_D", "recon", "kl"):
        assert m_multi[k] == pytest.approx(m_seq[k], rel=2e-3, abs=1e-5), k
    # atol sits above the worst observed single-element jitter (1.4e-4 on a
    # ~7e-3 param after 10 steps of ~1e-4-sized updates); a semantic
    # difference (wrong batch, wrong rng, skipped step) moves params by the
    # update scale ~1e-3+ across the tree, not one element.
    for a, b in zip(jax.tree.leaves(t_seq.state.g_params),
                    jax.tree.leaves(t_multi.state.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)
    assert int(t_multi.state.step) == steps


def test_recon_only_eval_step_skips_gan_and_perc():
    """vanilla/unet validation is recon-only in the reference
    (vae-gan.py:324-377): the eval step must not compute (or report) the
    discriminator and perceptual losses for full_loss_val=False configs."""
    from vae_gan_mark_tpu.train.step import jit_eval_step

    cfg = get_config("unet", **TINY)
    assert not cfg.full_loss_val
    ds = SyntheticPatchDataset(cfg, num_samples=16, seed=0)
    batch = device_batch(ds.batch(8, 0))
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    metrics, fake = jit_eval_step(cfg)(state, load_vgg_params(), batch,
                                       jax.random.PRNGKey(1),
                                       jnp.float32(1e-4))
    assert fake.shape == batch["en"].shape
    for key in ("recon", "kl", "psnr", "masked_l1", "mark_recovery"):
        assert np.isfinite(float(metrics[key])), key
    for key in ("loss_G", "loss_D", "gan_g", "perc"):
        assert key not in metrics, key


def test_vae_loss_decreases_fast():
    """Pure-VAE objective (no GAN/perc noise): recon must drop in 30 steps."""
    cfg = get_config("v2", gan_weight=0.0, perc_weight=0.0, lr_g=2e-3,
                     **TINY)
    ds = SyntheticPatchDataset(cfg, num_samples=64, seed=0)
    state = create_train_state(cfg, jax.random.PRNGKey(0),
                               device_batch(ds.batch(8, 0)))
    vgg = load_vgg_params()
    step = jit_train_step(cfg)
    rng = jax.random.PRNGKey(2)
    recons = []
    for i in range(30):
        state, m = step(state, vgg, device_batch(ds.batch(8, i)), rng,
                        jnp.float32(1e-5))
        recons.append(float(m["recon"]))
    first, last = np.mean(recons[:5]), np.mean(recons[-5:])
    assert last < first * 0.95, f"recon {first:.4f} -> {last:.4f}"
