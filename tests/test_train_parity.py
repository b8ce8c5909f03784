"""Training-trajectory parity regression vs the from-spec torch v2.

Runs benchmarks/train_parity.py's protocol for a short horizon at tiny
scale: identical ported f32 init (generator + discriminator incl.
spectral-norm u + perceptual head), identical batches and reparameterization
noise, dropout 0, unfused D forward. Asserts the per-step loss curves of
the two frameworks stay within float-accumulation tolerance — the "the
rebuild trains identically" proof (reference step being mirrored:
/root/reference/vae-gan-v2.py:696-740).

The longer captured run (200 steps) lives in benchmarks/train_parity.json /
PARITY_TRAIN.md.
"""

import numpy as np
import pytest

pytest.importorskip("torch")

import sys  # noqa: E402
import os  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from benchmarks.train_parity import jax_side, torch_side  # noqa: E402

pytestmark = pytest.mark.slow

STEPS = 20
BATCH = 8


@pytest.fixture(scope="module")
def histories():
    from vae_gan_mark_tpu.config import get_config
    from vae_gan_mark_tpu.data.synthetic import SyntheticPatchDataset

    cfg = get_config(
        "v2", compute_dtype="float32", char_rnn_dropout=0.0,
        fused_disc_forward=False, batch_size=BATCH,
        patch_h=32, patch_w=64, enc_chans=(8, 16, 24, 32), bottleneck_ch=48,
        z_ch=16, char_emb_dim=16, char_rnn_hidden=16, max_text_len=12)
    ds = SyntheticPatchDataset(cfg, num_samples=BATCH * 2, seed=0)
    batches = [ds.batch(BATCH, i) for i in range(2)]
    rng = np.random.default_rng(42)
    eps = [rng.normal(0, 1, (BATCH, 1, 1, cfg.z_ch)).astype(np.float32)
           for _ in range(STEPS)]
    init, hist_t = torch_side(cfg, STEPS, batches, eps)
    hist_j = jax_side(init, cfg, STEPS, batches, eps)
    return hist_t, hist_j


def _curve(hist, key):
    return np.array([h[key] for h in hist])


# GAN training is chaotic: ulp-level rounding differences (which vary with
# XLA fusion decisions, i.e. with flags/backends) grow exponentially with
# step count — PARITY_TRAIN.md's control run shows torch deviates from
# *itself* by ~5% after 200 steps under a 1e-7 perturbation. So: tight
# tolerances on the first few steps (where systematic errors would show
# undamped), a generous envelope on the 20-step horizon (catches gross
# breakage only).
EARLY = 5


def test_generator_loss_curves_match(histories):
    hist_t, hist_j = histories
    a, b = _curve(hist_t, "loss_G"), _curve(hist_j, "loss_G")
    rel = np.abs(a - b) / np.maximum(np.abs(a), 1e-3)
    assert rel[:EARLY].max() < 2e-3, rel[:EARLY]
    assert rel.max() < 5e-2, rel.max()


def test_component_losses_match(histories):
    hist_t, hist_j = histories
    for key, early_tol, tol in (("recon", 5e-4, 5e-3),
                                ("kl", 2e-2, 2e-1),
                                ("gan_g", 5e-3, 2e-1),
                                ("perc", 1e-3, 2e-2)):
        a, b = _curve(hist_t, key), _curve(hist_j, key)
        rel = np.abs(a - b) / np.maximum(np.abs(a), 1e-3)
        assert rel[:EARLY].max() < early_tol, (key, rel[:EARLY])
        assert rel.max() < tol, (key, rel.max())


def test_discriminator_loss_matches_absolutely(histories):
    # Hinge terms hit exact zeros, making relative deviation meaningless;
    # assert absolute closeness instead.
    hist_t, hist_j = histories
    a, b = _curve(hist_t, "loss_D"), _curve(hist_j, "loss_D")
    assert np.abs(a - b)[:EARLY].max() < 5e-3, np.abs(a - b)[:EARLY]
    assert np.abs(a - b).max() < 5e-2, np.abs(a - b).max()


def test_losses_actually_evolve(histories):
    # Guard against a vacuous pass (e.g. frozen models producing constant
    # identical curves): training must move the losses.
    hist_t, _ = histories
    a = _curve(hist_t, "loss_G")
    assert np.abs(np.diff(a)).max() > 1e-4
