"""Training-engine integration tests on the CPU backend (tiny shapes).

Mirrors the test strategy SURVEY.md §4 mandates: jitted-step smoke + loss
decrease on a synthetic dataset + checkpoint round-trip resume equivalence.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vae_gan_mark_tpu.config import get_config
from vae_gan_mark_tpu.data.synthetic import device_batch, SyntheticPatchDataset
from vae_gan_mark_tpu.models.vgg import load_vgg_params
from vae_gan_mark_tpu.train.checkpoint import (
    restore_checkpoint, save_checkpoint)
from vae_gan_mark_tpu.train.loop import Trainer
from vae_gan_mark_tpu.train.schedule import (
    PlateauState, kl_weight_for_epoch, plateau_step)
from vae_gan_mark_tpu.train.state import create_train_state, get_lr, set_lr
from vae_gan_mark_tpu.train.step import (
    jit_eval_step, jit_multi_train_step, jit_train_step)

pytestmark = pytest.mark.slow  # multi-step training integration

TINY = dict(patch_h=32, patch_w=64, compute_dtype="float32",
            enc_chans=(8, 16, 24, 32), bottleneck_ch=48, z_ch=16,
            char_emb_dim=16, char_rnn_hidden=16, max_text_len=12,
            batch_size=8)


def make_setup(variant="v2", **overrides):
    kw = dict(TINY)
    if variant == "oldv":
        kw["enc_chans"] = (8, 16, 24)
    if variant in ("vanilla", "lr_sh"):
        kw["enc_chans"] = (8, 16, 24, 32)
    kw.update(overrides)
    cfg = get_config(variant, **kw)
    ds = SyntheticPatchDataset(cfg, num_samples=64, seed=0)
    batch0 = device_batch(ds.batch(8, 0))
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch0)
    vgg = load_vgg_params()
    return cfg, ds, state, vgg


@pytest.mark.parametrize("variant", ["vanilla", "v2", "oldv"])
def test_train_step_runs_and_is_finite(variant):
    cfg, ds, state, vgg = make_setup(variant)
    step = jit_train_step(cfg)
    rng = jax.random.PRNGKey(1)
    for i in range(3):
        batch = device_batch(ds.batch(8, i))
        state, m = step(state, vgg, batch, rng, jnp.float32(1e-4))
        for k, v in m.items():
            assert np.isfinite(float(v)), (k, float(v))
    assert int(state.step) == 3


def test_spectral_u_and_batch_stats_advance():
    cfg, ds, state, vgg = make_setup("v2")
    step = jit_train_step(cfg)
    u_before = jax.tree.map(np.asarray, state.d_spectral)
    bs_before = jax.tree.map(np.asarray, state.g_batch_stats)
    batch = device_batch(ds.batch(8, 0))
    state, _ = step(state, vgg, batch, jax.random.PRNGKey(1),
                    jnp.float32(1e-4))
    u_after = jax.tree.map(np.asarray, state.d_spectral)
    changed = jax.tree.map(lambda a, b: not np.allclose(a, b),
                           u_before, u_after)
    assert any(jax.tree.leaves(changed)), "spectral u must advance"
    bs_after = jax.tree.map(np.asarray, state.g_batch_stats)
    changed = jax.tree.map(lambda a, b: not np.allclose(a, b),
                           bs_before, bs_after)
    assert any(jax.tree.leaves(changed)), "BN running stats must update"


def test_vae_loss_decreases():
    """Pure-VAE config (no GAN/perc noise in the signal): recon must drop."""
    cfg, ds, state, vgg = make_setup(
        "v2", gan_weight=0.0, perc_weight=0.0, lr_g=2e-3)
    step = jit_train_step(cfg)
    rng = jax.random.PRNGKey(2)
    recons = []
    for i in range(60):
        batch = device_batch(ds.batch(8, i))
        state, m = step(state, vgg, batch, rng, jnp.float32(1e-5))
        recons.append(float(m["recon"]))
    first, last = np.mean(recons[:10]), np.mean(recons[-10:])
    assert last < first * 0.9, f"recon {first:.4f} -> {last:.4f}"


def test_lr_get_set_roundtrip():
    cfg, ds, state, vgg = make_setup("v2")
    assert get_lr(state.opt_g) == pytest.approx(1e-4)
    new_opt = set_lr(state.opt_g, 5e-5)
    assert get_lr(new_opt) == pytest.approx(5e-5)


def test_checkpoint_resume_bitwise(tmp_path):
    """Save -> restore -> continue must equal continuous training bitwise."""
    cfg, ds, state, vgg = make_setup("v2")
    step = jit_train_step(cfg)
    rng = jax.random.PRNGKey(3)

    def advance(s, start, n):
        for i in range(start, start + n):
            batch = device_batch(ds.batch(8, i))
            s, m = step(s, vgg, batch, rng, jnp.float32(1e-4))
        return s, m

    state, _ = advance(state, 0, 3)
    save_checkpoint(str(tmp_path), "ck", state, epoch=0, best_val=1.0,
                    sched_g=PlateauState(), sched_d=PlateauState(),
                    lr_g=1e-4, lr_d=1e-4)
    # Restore BEFORE the continuation donates `state`'s buffers (the step
    # has donate_argnums=(0,); real on TPU, a no-op on CPU).
    restored, meta = restore_checkpoint(str(tmp_path), "ck", state)
    assert meta["epoch"] == 0
    cont_state, cont_m = advance(state, 3, 2)
    res_state, res_m = advance(restored, 3, 2)
    for k in cont_m:
        assert float(cont_m[k]) == pytest.approx(float(res_m[k]), rel=1e-6), k
    leaves_a = jax.tree.leaves(cont_state.g_params)
    leaves_b = jax.tree.leaves(res_state.g_params)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_step_metrics():
    cfg, ds, state, vgg = make_setup("v2")
    estep = jit_eval_step(cfg)
    batch = device_batch(ds.batch(8, 0))
    metrics, fake = estep(state, vgg, batch, jax.random.PRNGKey(0),
                          jnp.float32(1e-4))
    assert fake.shape == batch["en"].shape
    for key in ("recon", "kl", "gan_g", "perc", "loss_G", "loss_D", "psnr"):
        assert np.isfinite(float(metrics[key])), key


def test_plateau_scheduler_torch_semantics():
    from vae_gan_mark_tpu.config import SchedulerConfig
    sc = SchedulerConfig(factor=0.5, patience=2, threshold=1e-4, min_lr=1e-6)
    st = PlateauState()
    lr = 1.0
    lr = plateau_step(sc, st, 1.0, lr)   # first epoch sets best
    assert lr == 1.0
    for _ in range(2):                   # two bad epochs: within patience
        lr = plateau_step(sc, st, 1.0, lr)
    assert lr == 1.0
    lr = plateau_step(sc, st, 1.0, lr)   # third bad epoch: > patience
    assert lr == 0.5
    lr = plateau_step(sc, st, 0.5, lr)   # improvement resets
    assert lr == 0.5 and st.num_bad_epochs == 0
    # min_lr floor
    st2 = PlateauState(best=0.1)
    lr2 = 2e-6
    for _ in range(10):
        lr2 = plateau_step(sc, st2, 1.0, lr2)
    assert lr2 == pytest.approx(1e-6)


def test_kl_anneal_schedule():
    cfg = get_config("v2", **TINY)
    w0 = kl_weight_for_epoch(cfg, 0)
    w_mid = kl_weight_for_epoch(cfg, 10)
    w_end = kl_weight_for_epoch(cfg, 19)
    w_after = kl_weight_for_epoch(cfg, 25)
    assert w0 == pytest.approx(cfg.start_kl_weight)
    assert w0 < w_mid < w_end
    assert w_end == pytest.approx(cfg.kl_weight, rel=1e-6)
    assert w_after == cfg.kl_weight
    # No annealing for vanilla.
    cfg_v = get_config("vanilla", **TINY)
    assert kl_weight_for_epoch(cfg_v, 0) == cfg_v.kl_weight


def test_trainer_fit_synthetic(tmp_path):
    cfg = get_config("v2", **{**TINY, "batch_size": 8})
    ds = SyntheticPatchDataset(cfg, num_samples=32, seed=0)
    val_ds = SyntheticPatchDataset(cfg, num_samples=16, seed=1)

    def train_data(epoch):
        for i in range(4):
            yield ds.batch(8, i)

    def val_data(epoch):
        for i in range(2):
            yield val_ds.batch(8, i)

    trainer = Trainer(cfg, train_data, val_data, workdir=str(tmp_path),
                      use_mesh=False)
    best = trainer.fit(epochs=2)
    assert np.isfinite(best)
    assert os.path.isdir(os.path.join(str(tmp_path), "last_checkpoint"))
    assert os.path.isdir(os.path.join(str(tmp_path), "best_model"))
    # Metrics JSONL written with the reference's schema.
    import json
    lines = [json.loads(line) for line in
             open(os.path.join(str(tmp_path), "v2.metrics.jsonl"))]
    assert "train/generator_loss" in lines[-1]
    assert "val/recon_loss" in lines[-1]
    assert "learning_rate/generator" in lines[-1]

    # Resume: a new Trainer picks up from the checkpoint.
    trainer2 = Trainer(cfg, train_data, val_data, workdir=str(tmp_path),
                       use_mesh=False)
    assert trainer2.epoch == 2


def test_save_every_cadence(tmp_path):
    """cfg.save_every throttles last_checkpoint saves (best_model still
    saves on every improvement); the final epoch always saves."""
    cfg = get_config("v2", **{**TINY, "batch_size": 8, "save_every": 2})
    ds = SyntheticPatchDataset(cfg, num_samples=16, seed=0)

    def data(epoch):
        for i in range(2):
            yield ds.batch(8, i)

    trainer = Trainer(cfg, data, data, workdir=str(tmp_path),
                      use_mesh=False)
    calls = []
    orig = trainer._save

    def spy(name, epoch):
        calls.append((name, epoch))
        return orig(name, epoch)

    trainer._save = spy
    trainer.fit(epochs=3)
    last_epochs = [e for n, e in calls if n == "last_checkpoint"]
    # Epoch indices 0,1,2: (1+1)%2==0 -> epoch 1; epoch 2 is final.
    assert last_epochs == [1, 2], last_epochs
    assert os.path.isdir(os.path.join(str(tmp_path), "last_checkpoint"))


@pytest.mark.parametrize("variant", ["lr_sh", "unet"])
def test_remaining_variants_train_step(variant):
    cfg, ds, state, vgg = make_setup(variant)
    step = jit_train_step(cfg)
    batch = device_batch(ds.batch(8, 0))
    state, m = step(state, vgg, batch, jax.random.PRNGKey(1),
                    jnp.float32(cfg.kl_weight))
    for k, v in m.items():
        assert np.isfinite(float(v)), (k, float(v))


def test_full_loss_val_flavor():
    """lr_sh/v2/oldv compute every loss in validation
    (vae-gan-lr-sh.py:409-524); the Trainer must log them all."""
    cfg = get_config("lr_sh", **{**TINY, "enc_chans": (8, 16, 24, 32)})
    assert cfg.full_loss_val
    ds = SyntheticPatchDataset(cfg, num_samples=16, seed=0)

    def data(epoch):
        for i in range(2):
            yield ds.batch(8, i)

    import tempfile
    with tempfile.TemporaryDirectory() as wd:
        trainer = Trainer(cfg, data, data, workdir=wd, use_mesh=False)
        trainer.fit(epochs=1)
        import json
        lines = [json.loads(line) for line in
                 open(os.path.join(wd, "lr_sh.metrics.jsonl"))]
        last = lines[-1]
        for key in ("val/recon_loss", "val/generator_loss",
                    "val/discriminator_loss", "val/kl_loss",
                    "val/kl_loss_raw", "val/kl_loss_weighted",
                    "val/gan_loss_g", "val/perceptual_loss", "val/psnr"):
            assert key in last, key
        # Reference semantics (vae-gan-v2.py:652-653): weighted = raw KL
        # scaled by the epoch's (annealed) KL weight.
        assert last["val/kl_loss_raw"] == last["val/kl_loss"]
        assert last["val/kl_loss_weighted"] == pytest.approx(
            last["val/kl_loss_raw"] * last["train_params/current_kl_weight"])


def test_scheduler_reduces_lr_on_plateau_in_trainer():
    """End-to-end: constant val loss for > patience epochs lowers both LRs."""
    from vae_gan_mark_tpu.config import SchedulerConfig
    cfg = get_config("v2", **TINY,
                     scheduler=SchedulerConfig(factor=0.5, patience=1,
                                               threshold=1e-4, min_lr=1e-7))
    ds = SyntheticPatchDataset(cfg, num_samples=8, seed=0)

    def data(epoch):
        yield ds.batch(8, 0)

    import tempfile
    with tempfile.TemporaryDirectory() as wd:
        trainer = Trainer(cfg, data, data, workdir=wd, use_mesh=False)
        lr0 = get_lr(trainer.state.opt_g)
        trainer.fit(epochs=4)
        # With patience=1, 4 epochs of non-improving val reduce LR at least
        # once (epoch 1 sets best; epochs 2-4 are bad).
        assert get_lr(trainer.state.opt_g) < lr0
        assert get_lr(trainer.state.opt_d) < lr0


def test_multi_step_equals_sequential_steps():
    """One K-step scan dispatch must equal K sequential single-step calls
    (params bitwise-close, metrics = per-step mean)."""
    cfg, ds, state, vgg = make_setup("v2")
    b0 = device_batch(ds.batch(8, 0))
    b1 = device_batch(ds.batch(8, 1))
    stacked = {k: jnp.stack([b0[k], b1[k]]) for k in b0}
    rng = jax.random.PRNGKey(5)
    kl = jnp.float32(1e-4)

    single = jit_train_step(cfg)
    s_seq, m0 = single(state, vgg, b0, rng, kl)
    s_seq, m1 = single(s_seq, vgg, b1, rng, kl)

    _, _, state2, _ = make_setup("v2")  # fresh identical init (donation)
    s_multi, m = jit_multi_train_step(cfg)(state2, vgg, stacked, rng, kl)

    assert int(s_multi.step) == int(s_seq.step) == 2
    for k in m:
        expected = 0.5 * (float(m0[k]) + float(m1[k]))
        np.testing.assert_allclose(float(m[k]), expected, rtol=1e-5,
                                   atol=1e-6, err_msg=k)
    # scan and unrolled bodies fuse differently; ulp-level gradient rounding
    # passes through Adam's rsqrt normalization, leaving ~1e-5 absolute
    # param differences after two steps (measured 8.6e-6 max).
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-4, atol=3e-5),
        s_multi.g_params, s_seq.g_params)


def test_remat_encoder_is_numerically_transparent():
    """cfg.remat_encoder reruns the encoder in the backward pass
    (jax.checkpoint); parameters, outputs, and updates must be unchanged."""
    cfg, ds, state, vgg = make_setup("v2")
    cfg_r = get_config("v2", **{**TINY, "remat_encoder": True})
    batch = device_batch(ds.batch(8, 0))
    rng = jax.random.PRNGKey(1)
    kl = jnp.float32(1e-4)
    s_plain, m_plain = jit_train_step(cfg)(state, vgg, batch, rng, kl)
    # Rebuild the same initial state (step donates its input buffers).
    _, _, state2, _ = make_setup("v2")
    s_remat, m_remat = jit_train_step(cfg_r)(state2, vgg, batch, rng, kl)
    for k in m_plain:
        np.testing.assert_allclose(float(m_plain[k]), float(m_remat[k]),
                                   rtol=2e-5, atol=2e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6),
        s_plain.g_params, s_remat.g_params)


def test_resume_with_changed_loss_weights(tmp_path):
    """Warm-start protocol (examples/vocab_run/gan_warmstart): train under
    gan_weight=0, then resume the same workdir with the full reference
    gan_weight. Resume must pick up epoch/opt/scheduler state and train
    under the new loss — the TPU-side analogue of the reference loading
    checkpoints with strict=False into a script with different constants
    (vae-gan-v2.py:963-995)."""
    base = {**TINY, "batch_size": 8, "save_every": 1}
    ds = SyntheticPatchDataset(get_config("v2", **base), num_samples=16,
                               seed=0)

    def data(epoch):
        for i in range(2):
            yield ds.batch(8, i)

    cfg0 = get_config("v2", **{**base, "gan_weight": 0.0})
    t1 = Trainer(cfg0, data, data, workdir=str(tmp_path), use_mesh=False)
    t1.fit(epochs=1)

    cfg1 = get_config("v2", **base)          # reference gan_weight (0.15)
    assert cfg1.gan_weight > 0
    t2 = Trainer(cfg1, data, data, workdir=str(tmp_path), use_mesh=False)
    assert t2.epoch == 1                     # resumed, not restarted
    best = t2.fit(epochs=2)
    assert np.isfinite(best)
    import json
    lines = [json.loads(line) for line in
             open(os.path.join(str(tmp_path), "v2.metrics.jsonl"))]
    # Epoch 2 trained with the adversarial term active.
    assert lines[-1]["train/gan_loss_g"] != 0.0
