"""The serve / eval command-line tools drive end to end against a saved
checkpoint (tiny config, synthetic inputs)."""

import json
import os

import numpy as np
import pytest

import jax

from vae_gan_mark_tpu.config import get_config
from vae_gan_mark_tpu.data.synthetic import SyntheticPatchDataset, device_batch
from vae_gan_mark_tpu.train.checkpoint import save_checkpoint
from vae_gan_mark_tpu.train.schedule import PlateauState
from vae_gan_mark_tpu.train.state import create_train_state

pytestmark = pytest.mark.slow

TINY_SET = ["--set", "patch_h=32", "--set", "patch_w=64",
            "--set", "enc_chans=8,16,24,32", "--set", "bottleneck_ch=48",
            "--set", "z_ch=16", "--set", "char_emb_dim=16",
            "--set", "char_rnn_hidden=16", "--set", "max_text_len=12",
            "--set", "compute_dtype=float32", "--set", "batch_size=8"]


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("cli_ckpt"))
    cfg = get_config("v2", patch_h=32, patch_w=64, compute_dtype="float32",
                     enc_chans=(8, 16, 24, 32), bottleneck_ch=48, z_ch=16,
                     char_emb_dim=16, char_rnn_hidden=16, max_text_len=12,
                     batch_size=8)
    ds = SyntheticPatchDataset(cfg, 8, seed=0)
    state = create_train_state(cfg, jax.random.PRNGKey(0),
                               device_batch(ds.batch(8, 0)))
    save_checkpoint(wd, "best_model", state, epoch=3, best_val=0.5,
                    sched_g=PlateauState(), sched_d=PlateauState(),
                    lr_g=1e-4, lr_d=1e-4)
    return wd


def test_eval_cli_synthetic(workdir, capsys):
    from vae_gan_mark_tpu.eval.__main__ import main
    main(["--variant", "v2", "--workdir", workdir, "--synthetic",
          "--synthetic-samples", "16"] + TINY_SET)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    metrics = json.loads(out)
    for key in ("recon", "psnr", "masked_l1", "mark_recovery", "loss_G"):
        assert key in metrics and np.isfinite(metrics[key]), key
    assert metrics["samples"] == 16
    assert metrics["checkpoint_epoch"] == 3


def test_eval_cli_shuffle_text_ablation(workdir, capsys):
    """--shuffle-text must run the same pipeline with rolled text rows and
    produce (slightly) different metrics — the conditioning path is live
    even at random init, so mis-paired tokens change the output."""
    from vae_gan_mark_tpu.eval.__main__ import main
    args = ["--variant", "v2", "--workdir", workdir, "--synthetic",
            "--synthetic-samples", "16"] + TINY_SET
    main(args)
    true_m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    main(args + ["--shuffle-text"])
    shuf_m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    for key in ("recon", "masked_l1", "mark_recovery"):
        assert np.isfinite(shuf_m[key]), key
    assert shuf_m["samples"] == true_m["samples"] == 16
    # kl is text-independent (encoder never sees text): identical.
    assert shuf_m["kl"] == pytest.approx(true_m["kl"], rel=1e-6)
    # The generated pixels must differ through the FiLM path.
    assert shuf_m["recon"] != true_m["recon"]


def test_serve_cli_renders_png(workdir, tmp_path):
    from PIL import Image
    from vae_gan_mark_tpu.serve.__main__ import main
    rng = np.random.default_rng(0)
    img_path = str(tmp_path / "img.png")
    mask_path = str(tmp_path / "mask.png")
    out_path = str(tmp_path / "out.png")
    Image.fromarray(rng.integers(0, 255, (100, 200, 3), np.uint8)).save(
        img_path)
    mask = np.zeros((100, 200), np.uint8)
    mask[30:60, 40:160] = 255
    Image.fromarray(mask).save(mask_path)
    main(["--variant", "v2", "--workdir", workdir,
          "--image", img_path, "--mask", mask_path,
          "--quad", "40,30,160,32,158,60,38,58", "--text", "HELLO",
          "--out", out_path] + TINY_SET)
    out = np.asarray(Image.open(out_path))
    assert out.shape == (100, 200, 3)
    # Outside the quad the image is untouched; inside it was re-rendered.
    orig = np.asarray(Image.open(img_path))
    assert np.array_equal(out[:20], orig[:20])
    assert np.abs(out[32:58, 42:156].astype(int)
                  - orig[32:58, 42:156].astype(int)).max() > 0
