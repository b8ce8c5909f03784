"""Device-resident synthetic data: keep the whole dataset in HBM, gather
batches on-chip by index.

The host-batch path ships every training batch over the host->device link;
on a tunneled/remote chip that transfer dominates the small-batch step
(measured: the 2048-sample v2 run sustains ~17 img/s host-fed vs ~25 ms of
device work per step). A synthetic dataset is static across epochs, so the
TPU-native layout is: push ``ru``/``en``/``mask``/``text`` to the device
once, and per batch transfer only the int32 row indices — the gather runs
on-chip and its output feeds the jitted step without touching the host.

Batch content and order are IDENTICAL to ``SyntheticPatchDataset.batch``
(same ``(arange(bs) + step*bs) % n`` indexing), so a run checkpointed under
the host path resumes bit-compatibly under this one and vice versa
(tests/test_device_synthetic.py).

Single-process only: multi-process runs feed per-host shards through
``global_batch_from_local`` instead.
"""

from __future__ import annotations

from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np


class DeviceResidentSynthetic:
    """DataSource (``epoch -> iterator of batches``) whose yielded image and
    text arrays are jax device arrays gathered from a device-resident copy
    of the dataset. ``raw_text`` stays a host list (only used for val-image
    captions)."""

    def __init__(self, ds, batch_size: int, steps_per_epoch: int,
                 advance_per_epoch: bool = True):
        assert jax.process_count() == 1, (
            "device-resident data is single-process only")
        self.ds = ds
        self.batch_size = batch_size
        self.steps = steps_per_epoch
        # Train sources advance the batch window across epochs (cli.py
        # yields batch(bs, i + epoch*steps)); val sources replay the same
        # window every epoch (batch(bs, i)).
        self.advance = advance_per_epoch
        n = ds.num_samples
        all_idx = np.arange(n)
        self.data = {
            "ru": jax.device_put(ds.ru),
            "en": jax.device_put(ds.en),
            "mask": jax.device_put(ds.mask),
            "text": jax.device_put(ds.text_batch(all_idx)),
        }
        self._take = jax.jit(
            lambda data, idx: jax.tree.map(lambda a: a[idx], data))

    def __call__(self, epoch: int) -> Iterator[dict]:
        n = self.ds.num_samples
        bs = self.batch_size
        base = epoch * self.steps if self.advance else 0
        for i in range(self.steps):
            step = base + i
            idx = (np.arange(bs) + step * bs) % n
            batch = dict(self._take(self.data, jnp.asarray(idx)))
            batch["raw_text"] = [self.ds.texts[j] for j in idx]
            yield batch

    def nbytes(self) -> int:
        return sum(int(np.prod(a.shape)) * a.dtype.itemsize
                   for a in self.data.values())
