"""Device-resident synthetic data (data/device_synthetic.py): the on-chip
gather path must yield exactly the host path's batches (content, order, and
epoch advancement), so that checkpoints resume across either path and the
training trajectory is independent of the data placement."""

import jax.numpy as jnp
import numpy as np

from vae_gan_mark_tpu.config import get_config
from vae_gan_mark_tpu.data.device_synthetic import DeviceResidentSynthetic
from vae_gan_mark_tpu.data.synthetic import SyntheticPatchDataset

TINY = dict(patch_h=32, patch_w=64, enc_chans=(8, 16), bottleneck_ch=24,
            z_ch=8, char_emb_dim=8, char_rnn_hidden=8, max_text_len=8,
            compute_dtype="float32", batch_size=4)


def test_batches_match_host_path():
    cfg = get_config("v2", **TINY)
    ds = SyntheticPatchDataset(cfg, num_samples=12, seed=0, text_vocab=4)
    steps = 3
    src = DeviceResidentSynthetic(ds, batch_size=4, steps_per_epoch=steps)
    for epoch in (0, 2):
        got = list(src(epoch))
        assert len(got) == steps
        for i, b in enumerate(got):
            want = ds.batch(4, i + epoch * steps)
            for k in ("ru", "en", "mask", "text"):
                np.testing.assert_array_equal(np.asarray(b[k]), want[k]), k
            assert b["raw_text"] == want["raw_text"]
    # Val flavor replays the same window each epoch.
    val = DeviceResidentSynthetic(ds, batch_size=4, steps_per_epoch=2,
                                  advance_per_epoch=False)
    a = [np.asarray(b["ru"]) for b in val(0)]
    b = [np.asarray(b["ru"]) for b in val(5)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_sbert_text_batches_match():
    cfg = get_config("vanilla", **TINY)
    ds = SyntheticPatchDataset(cfg, num_samples=8, seed=1)
    src = DeviceResidentSynthetic(ds, batch_size=4, steps_per_epoch=2)
    for i, b in enumerate(src(0)):
        want = ds.batch(4, i)
        np.testing.assert_array_equal(np.asarray(b["text"]), want["text"])


def test_trainer_trajectory_identical_to_host_path(tmp_path):
    """Two epochs of the real Trainer (multi_step=2 to exercise on-device
    stacking) produce identical metrics whether batches are host-fed or
    device-resident."""
    from vae_gan_mark_tpu.train.loop import Trainer

    cfg = get_config("v2", **TINY, char_rnn_dropout=0.0)
    ds = SyntheticPatchDataset(cfg, num_samples=8, seed=0)
    vds = SyntheticPatchDataset(cfg, num_samples=4, seed=1)
    steps = 2

    def host_train(epoch):
        for i in range(steps):
            yield ds.batch(4, i + epoch * steps)

    def host_val(epoch):
        yield vds.batch(4, 0)

    dev_train = DeviceResidentSynthetic(ds, 4, steps)
    dev_val = DeviceResidentSynthetic(vds, 4, 1, advance_per_epoch=False)

    results = []
    for name, (tr, va) in (("host", (host_train, host_val)),
                           ("dev", (dev_train, dev_val))):
        t = Trainer(cfg, tr, va, workdir=str(tmp_path / name), seed=0,
                    use_mesh=False, multi_step=2)
        t.fit(epochs=2)
        rows = [__import__("json").loads(line) for line in
                open(tmp_path / name / "v2.metrics.jsonl")]
        results.append(rows)
    host_rows, dev_rows = results
    assert len(host_rows) == len(dev_rows) == 2
    for hr, dr in zip(host_rows, dev_rows):
        for k, v in hr.items():
            if isinstance(v, float) and "images_per_sec" not in k \
                    and not k.startswith("_"):
                assert v == __import__("pytest").approx(dr[k],
                                                        rel=1e-6, abs=1e-7), k
