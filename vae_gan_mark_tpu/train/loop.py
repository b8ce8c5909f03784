"""Epoch driver: the framework's replacement for the reference's
``train_loop`` / ``val_loop`` / ``main`` trio (vae-gan-v2.py:672-825).

Responsibilities (matching SURVEY.md §2.11 + §5):
  * per-epoch training over a data source of host batches, through one
    jitted D-then-G step;
  * KL annealing (host scalar into the step — no recompile);
  * validation (recon-only or full-loss flavor per config), val image
    triplets;
  * ReduceLROnPlateau on val recon for both optimizers;
  * last/best checkpointing via Orbax + resume;
  * metric logging with the reference's ``train/*``, ``val/*``,
    ``learning_rate/*`` schema;
  * optional data parallelism over a device mesh (params replicated, batch
    sharded — XLA inserts the psum over ICI);
  * NaN guard (the TPU-era stand-in for torch's detect_anomaly,
    vae-gan-v2.py:1028) and optional jax.profiler traces.

Data sources are callables ``epoch -> iterator of host batches`` where a
batch is a dict with keys ru/en/mask/text (NHWC float32 in [0,1] + tokens or
SBERT embeddings).
"""

from __future__ import annotations

import os
import time
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vae_gan_mark_tpu.config import VariantConfig
from vae_gan_mark_tpu.models.vgg import load_vgg_params
from vae_gan_mark_tpu.parallel.mesh import (
    make_mesh, replicate_tree, shard_batch)
from vae_gan_mark_tpu.train.checkpoint import (
    restore_checkpoint, save_checkpoint)
from vae_gan_mark_tpu.train.metrics import MetricsLogger
from vae_gan_mark_tpu.train.schedule import (
    PlateauState, kl_weight_for_epoch, plateau_step)
from vae_gan_mark_tpu.train.state import (
    create_train_state, get_lr, set_lr)
from vae_gan_mark_tpu.train.step import (
    jit_eval_step, jit_multi_eval_step, jit_multi_train_step,
    jit_train_step)

DataSource = Callable[[int], Iterator[dict]]


def _stack_batches(group: list) -> dict:
    """Stack K batch dicts along a new leading steps axis. Device-resident
    batches (jax arrays, data/device_synthetic.py) stack on-device —
    no host round-trip; host batches stack in numpy."""
    keys = [k for k in group[0] if k != "raw_text"]
    if isinstance(group[0]["ru"], jax.Array):
        return {k: jnp.stack([g[k] for g in group]) for k in keys}
    return {k: np.stack([np.asarray(g[k]) for g in group]) for k in keys}


class _NullLogger:
    """Logger stand-in for non-primary processes in multi-process runs."""

    def log(self, *a, **k):
        pass

    def log_images(self, *a, **k):
        pass

    def set_summary(self, *a, **k):
        pass

    def log_model_artifact(self, *a, **k):
        pass

    def finish(self):
        pass


def prefetch_to_device(iterator: Iterator[dict], put, size: int = 2):
    """Double-buffered host->device prefetch.

    A daemon thread pulls host batches and issues their device transfers
    while the main thread's current step is still executing, so step N's
    compute overlaps batch N+1's load+transfer (JAX dispatch is async; the
    transfer happens on the stream without blocking compute). ``None``
    batches (safe-collate semantics) are dropped here.
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()
    stop = threading.Event()

    def send(item) -> bool:
        # Bounded put that gives up when the consumer abandoned the
        # generator (train_step raised / KeyboardInterrupt) — otherwise the
        # thread would block forever holding transferred device batches.
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterator:
                if item is None:
                    continue
                if not send(put(item)):
                    return
            send(sentinel)
        except BaseException as e:  # propagate into the consumer
            send(e)

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        while not q.empty():  # release pinned device buffers
            q.get_nowait()


class Trainer:
    def __init__(self, cfg: VariantConfig, train_data: DataSource,
                 val_data: Optional[DataSource], workdir: str,
                 seed: int = 0, use_mesh: bool = True,
                 logger: Optional[MetricsLogger] = None,
                 nan_guard: bool = True,
                 profile_dir: Optional[str] = None,
                 multi_step: int = 1):
        self.cfg = cfg
        self.train_data = train_data
        self.val_data = val_data
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)
        # In multi-process runs only process 0 writes metrics/images (every
        # process sees identical replicated metric values).
        self.is_main = jax.process_index() == 0
        if logger is None:
            logger = (MetricsLogger(workdir, run_name=cfg.name)
                      if self.is_main else _NullLogger())
        self.logger = logger
        self.nan_guard = nan_guard
        self.profile_dir = profile_dir

        self.mesh = make_mesh() if use_mesh else None
        self.rng = jax.random.PRNGKey(seed)

        first_batch = next(iter(train_data(0)))
        init_batch = {k: jnp.asarray(v) for k, v in first_batch.items()
                      if k != "raw_text"}
        self.state = create_train_state(cfg, self.rng, init_batch)
        self.vgg_params = load_vgg_params()
        if self.mesh is not None:
            self.state = replicate_tree(self.state, self.mesh)
            self.vgg_params = replicate_tree(self.vgg_params, self.mesh)

        self.train_step = jit_train_step(cfg)
        self.eval_step = jit_eval_step(cfg)
        # K>1 scans K train steps per dispatch (train/step.py:
        # build_multi_train_step) — semantics identical to K sequential
        # steps; a pure dispatch-latency optimization for remote/tunneled
        # chips where each dispatch pays a host round-trip that dwarfs the
        # small-batch step's ~25 ms of device work.
        self.multi_step = max(int(multi_step), 1)
        if self.multi_step > 1:
            assert jax.process_count() == 1, \
                "multi-step dispatch is single-process only"
            self.multi_train_step = jit_multi_train_step(cfg)
            self.multi_eval_step = jit_multi_eval_step(cfg)

        self.epoch = 0
        self.best_val = float("inf")
        self.sched_g = PlateauState()
        self.sched_d = PlateauState()
        self._maybe_resume()

    # ------------------------------------------------------------------
    def _maybe_resume(self):
        restored = restore_checkpoint(self.workdir, "last_checkpoint",
                                      self.state)
        if restored is None:
            return
        state, meta = restored
        self.state = state
        if self.mesh is not None:
            self.state = replicate_tree(self.state, self.mesh)
        self.epoch = meta["epoch"] + 1
        self.best_val = meta["best_val"]
        self.sched_g = meta["sched_g"]
        self.sched_d = meta["sched_d"]
        self.state = self.state.replace(
            opt_g=set_lr(self.state.opt_g, meta["lr_g"]),
            opt_d=set_lr(self.state.opt_d, meta["lr_d"]))
        print(f"[resume] from epoch {meta['epoch']} "
              f"(best_val={self.best_val:.4f})")

    def _put(self, batch: dict, stacked: bool = False) -> dict:
        batch = {k: v for k, v in batch.items() if k != "raw_text"}
        if self.mesh is not None:
            if jax.process_count() > 1:
                # Multi-process: ``batch`` holds this process's rows only;
                # assemble the global batch-sharded arrays.
                from vae_gan_mark_tpu.parallel.distributed import (
                    global_batch_from_local)
                return global_batch_from_local(
                    {k: np.asarray(v) for k, v in batch.items()}, self.mesh)
            if stacked:
                # (K, B, ...) stacks for multi-step dispatch: the batch dim
                # is axis 1; the steps axis stays unsharded.
                from jax.sharding import NamedSharding, PartitionSpec as P
                from vae_gan_mark_tpu.parallel.mesh import DATA_AXIS
                s = NamedSharding(self.mesh, P(None, DATA_AXIS))
                return {k: jax.device_put(v, s) for k, v in batch.items()}
            return shard_batch(batch, self.mesh)
        return {k: jnp.asarray(v) for k, v in batch.items()}

    # ------------------------------------------------------------------
    def train_epoch(self, epoch: int) -> dict:
        kl_w = jnp.float32(kl_weight_for_epoch(self.cfg, epoch))
        # Metric sums stay on device; one host transfer per epoch. A
        # per-step fetch would cost several tunnel round-trips per step and
        # serialize dispatch against execution.
        sums, count = None, 0
        t0 = time.time()
        images = 0
        if self.multi_step > 1:
            sums, count, images = self._train_epoch_multi(epoch, kl_w)
        else:
            # None batches (safe-batch semantics, vae-gan.py:400) are
            # dropped by the prefetcher; device transfer of batch N+1
            # overlaps step N.
            for batch in prefetch_to_device(self.train_data(epoch),
                                            self._put):
                self.state, metrics = self.train_step(
                    self.state, self.vgg_params, batch, self.rng, kl_w)
                images += batch["ru"].shape[0]
                sums = metrics if sums is None else jax.tree.map(
                    jnp.add, sums, metrics)
                count += 1
        avg = {k: float(v) / max(count, 1)
               for k, v in (sums or {}).items()}  # forces completion
        dt = time.time() - t0
        if self.nan_guard and avg and not np.isfinite(avg["loss_G"]):
            raise FloatingPointError(
                f"non-finite generator loss in epoch {epoch} "
                f"(enable utils.debug.enable_nan_debugging to localize)")
        avg["images_per_sec"] = images / max(dt, 1e-9)
        avg["kl_weight"] = float(kl_w)
        return avg

    def _train_epoch_multi(self, epoch: int, kl_w) -> tuple:
        """K-steps-per-dispatch epoch body (multi_step > 1).

        Groups of K host batches are stacked along a leading steps axis and
        run through one scanned dispatch; a trailing group of < K batches
        (epoch length not divisible by K) falls back to the single-step
        path. Metric sums weight the scanned dispatch's per-step means by K
        so the epoch average equals the sequential path's.
        """
        K = self.multi_step

        def grouped():
            buf = []
            for b in self.train_data(epoch):
                if b is None:
                    continue
                buf.append(b)
                if len(buf) == K:
                    yield buf
                    buf = []
            if buf:
                yield buf

        def put_group(group):
            n_images = sum(g["ru"].shape[0] for g in group)
            if len(group) == K:
                stacked = _stack_batches(group)
                return ("multi", self._put(stacked, stacked=True),
                        len(group), n_images)
            return ("single", [self._put(g) for g in group],
                    len(group), n_images)

        sums, count, images = None, 0, 0
        for kind, payload, ksteps, n_images in prefetch_to_device(
                grouped(), put_group):
            if kind == "multi":
                self.state, metrics = self.multi_train_step(
                    self.state, self.vgg_params, payload, self.rng, kl_w)
                weighted = jax.tree.map(lambda m: m * ksteps, metrics)
            else:
                weighted = None
                for b in payload:
                    self.state, metrics = self.train_step(
                        self.state, self.vgg_params, b, self.rng, kl_w)
                    weighted = metrics if weighted is None else jax.tree.map(
                        jnp.add, weighted, metrics)
            sums = weighted if sums is None else jax.tree.map(
                jnp.add, sums, weighted)
            count += ksteps
            images += n_images
        return sums, count, images

    def validate(self, epoch: int) -> dict:
        if self.val_data is None:
            return {}
        kl_w = jnp.float32(kl_weight_for_epoch(self.cfg, epoch))
        if self.multi_step > 1:
            return self._validate_multi(epoch, kl_w)
        sums, n_samples = None, 0
        triplets = []
        for batch_idx, batch in enumerate(self.val_data(epoch)):
            if batch is None:
                continue
            host_batch = batch
            batch = self._put(batch)
            metrics, fake = self.eval_step(
                self.state, self.vgg_params, batch,
                jax.random.fold_in(self.rng, batch_idx), kl_w)
            bsz = batch["ru"].shape[0]
            n_samples += bsz
            weighted = jax.tree.map(lambda v: v * bsz, metrics)
            sums = weighted if sums is None else jax.tree.map(
                jnp.add, sums, weighted)
            if len(triplets) < 16 and self.is_main:
                if jax.process_count() > 1:
                    # `fake` is a global batch-sharded array whose shards
                    # span other hosts; np.asarray would raise. Use this
                    # process's addressable rows — they correspond to the
                    # local host_batch rows fed in. addressable_shards
                    # iteration order is not guaranteed to follow global
                    # index, so sort by each shard's batch-dim offset.
                    shards = sorted(
                        fake.addressable_shards,
                        key=lambda s: s.index[0].start or 0)
                    fake_np = np.concatenate(
                        [np.asarray(s.data) for s in shards])
                    bsz = min(bsz, fake_np.shape[0],
                              len(host_batch["ru"]))
                else:
                    fake_np = np.asarray(fake)
                raw_texts = host_batch.get("raw_text")
                for i in range(min(bsz, 16 - len(triplets))):
                    # Caption carries the target text like the reference
                    # (vae-gan.py:359-361: 50-char truncation).
                    if raw_texts is not None:
                        t = raw_texts[i]
                        label = t[:50] + "..." if len(t) > 50 else t
                        caption = f"Epoch {epoch + 1} | Target: '{label}'"
                    else:
                        caption = f"Epoch {epoch + 1}"
                    triplets.append((np.asarray(host_batch["ru"][i]),
                                     np.asarray(host_batch["en"][i]),
                                     fake_np[i], caption))
        avg = {k: float(v) / max(n_samples, 1)
               for k, v in (sums or {}).items()}
        if triplets:
            self.logger.log_images(triplets, step=epoch + 1)
        return avg

    def _validate_multi(self, epoch: int, kl_w) -> dict:
        """K-val-batches-per-dispatch flavor (multi_step > 1): metrics are
        identical to the sequential path (same per-batch rng folds, same
        batch-size weighting); triplets come from val batch 0 only — which
        is also all the sequential path uses whenever batch_size >= 16.
        Trailing groups of < K batches run through the single eval step.
        """
        K = self.multi_step
        sums, n_samples = None, 0
        fake0_np, first_host = None, None
        group, group_start, idx = [], 0, 0

        def add(weighted, n):
            nonlocal sums, n_samples
            sums = weighted if sums is None else jax.tree.map(
                jnp.add, sums, weighted)
            n_samples += n

        def flush(group, start):
            nonlocal fake0_np, first_host
            bsz = group[0]["ru"].shape[0]
            if len(group) == K:
                stacked = self._put(_stack_batches(group), stacked=True)
                metrics, fake0 = self.multi_eval_step(
                    self.state, self.vgg_params, stacked,
                    jnp.arange(start, start + K), self.rng, kl_w)
                add(jax.tree.map(lambda m: jnp.sum(m, axis=0) * bsz,
                                 metrics), K * bsz)
                if start == 0:
                    fake0_np = np.asarray(fake0)
                    first_host = group[0]
            else:
                for j, b in enumerate(group):
                    bj = np.asarray(b["ru"]).shape[0]
                    metrics, fake = self.eval_step(
                        self.state, self.vgg_params, self._put(b),
                        jax.random.fold_in(self.rng, start + j), kl_w)
                    add(jax.tree.map(lambda m: m * bj, metrics), bj)
                    if start + j == 0:
                        fake0_np = np.asarray(fake)
                        first_host = b

        for batch in self.val_data(epoch):
            if batch is None:
                continue
            group.append(batch)
            idx += 1
            if len(group) == K:
                flush(group, group_start)
                group, group_start = [], idx
        if group:
            flush(group, group_start)

        avg = {k: float(v) / max(n_samples, 1)
               for k, v in (sums or {}).items()}
        if fake0_np is not None and self.is_main:
            triplets = []
            raw_texts = first_host.get("raw_text")
            for i in range(min(fake0_np.shape[0], 16)):
                if raw_texts is not None:
                    t = raw_texts[i]
                    label = t[:50] + "..." if len(t) > 50 else t
                    caption = f"Epoch {epoch + 1} | Target: '{label}'"
                else:
                    caption = f"Epoch {epoch + 1}"
                triplets.append((np.asarray(first_host["ru"][i]),
                                 np.asarray(first_host["en"][i]),
                                 fake0_np[i], caption))
            if triplets:
                self.logger.log_images(triplets, step=epoch + 1)
        return avg

    # ------------------------------------------------------------------
    def fit(self, epochs: Optional[int] = None) -> float:
        cfg = self.cfg
        epochs = epochs if epochs is not None else cfg.epochs
        for epoch in range(self.epoch, epochs):
            if self.profile_dir and epoch == self.epoch + 1:
                jax.profiler.start_trace(self.profile_dir)
            train_metrics = self.train_epoch(epoch)
            log = {
                "epoch": epoch + 1,
                "train/generator_loss": train_metrics.get("loss_G", 0.0),
                "train/discriminator_loss": train_metrics.get("loss_D", 0.0),
                "train/recon_loss": train_metrics.get("recon", 0.0),
                "train/kl_loss": train_metrics.get("kl", 0.0),
                "train/gan_loss_g": train_metrics.get("gan_g", 0.0),
                "train/perceptual_loss": train_metrics.get("perc", 0.0),
                "train/images_per_sec": train_metrics.get("images_per_sec", 0.0),
                "train_params/current_kl_weight": train_metrics.get("kl_weight", 0.0),
                "learning_rate/generator": get_lr(self.state.opt_g),
                "learning_rate/discriminator": get_lr(self.state.opt_d),
            }

            val_metrics = self.validate(epoch)
            val_recon = val_metrics.get("recon", float("inf"))
            if val_metrics:
                log["val/recon_loss"] = val_recon
                log["val/psnr"] = val_metrics.get("psnr", 0.0)
                log["val/masked_l1"] = val_metrics.get("masked_l1", 0.0)
                log["val/mark_recovery"] = val_metrics.get(
                    "mark_recovery", 0.0)
                if cfg.full_loss_val:
                    log["val/generator_loss"] = val_metrics.get("loss_G", 0.0)
                    log["val/discriminator_loss"] = val_metrics.get(
                        "loss_D", 0.0)
                    # Reference schema (vae-gan-v2.py:652-653): the raw KL
                    # and the same average scaled by the epoch's annealed
                    # weight. val/kl_loss kept as a raw-KL alias for
                    # existing tooling.
                    kl_raw = val_metrics.get("kl", 0.0)
                    log["val/kl_loss"] = kl_raw
                    log["val/kl_loss_raw"] = kl_raw
                    log["val/kl_loss_weighted"] = (
                        kl_raw * train_metrics.get("kl_weight", 0.0))
                    log["val/gan_loss_g"] = val_metrics.get("gan_g", 0.0)
                    log["val/perceptual_loss"] = val_metrics.get("perc", 0.0)
            self.logger.log(log, step=epoch + 1)

            # ReduceLROnPlateau on val recon (vae-gan-lr-sh.py:751-760).
            if cfg.scheduler is not None and val_metrics:
                new_lr_g = plateau_step(cfg.scheduler, self.sched_g,
                                        val_recon, get_lr(self.state.opt_g))
                new_lr_d = plateau_step(cfg.scheduler, self.sched_d,
                                        val_recon, get_lr(self.state.opt_d))
                self.state = self.state.replace(
                    opt_g=set_lr(self.state.opt_g, new_lr_g),
                    opt_d=set_lr(self.state.opt_d, new_lr_d))

            # last/best checkpoints (vae-gan-v2.py:799-818).
            if val_recon < self.best_val:
                self.best_val = val_recon
                self.logger.set_summary("best_val_recon_loss", self.best_val)
                best_path = self._save("best_model", epoch)
                self.logger.log_model_artifact(best_path, epoch + 1,
                                               self.best_val)
            # last_checkpoint cadence is configurable (cfg.save_every;
            # default 1 = reference's every-epoch policy); the final epoch
            # always saves so resume/eval see the completed run.
            if ((epoch + 1) % max(cfg.save_every, 1) == 0
                    or epoch == epochs - 1):
                self._save("last_checkpoint", epoch)

            if self.profile_dir and epoch == self.epoch + 1:
                jax.profiler.stop_trace()
        return self.best_val

    def _save(self, name: str, epoch: int) -> str:
        return save_checkpoint(
            self.workdir, name, self.state, epoch, self.best_val,
            self.sched_g, self.sched_d,
            get_lr(self.state.opt_g), get_lr(self.state.opt_d))
