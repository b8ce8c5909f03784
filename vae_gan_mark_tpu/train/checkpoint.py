"""Checkpointing via Orbax: last/best policy matching the reference.

The reference saves ``last_checkpoint.pth`` every epoch and ``best_model.pth``
whenever val recon improves, storing models + both optimizers + schedulers +
epoch + best_val (vae-gan-v2.py:799-818). Here the device pytree (TrainState)
goes through Orbax; small host-side scalars (epoch, best_val, plateau
scheduler states, current LRs) live in a JSON sidecar.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from vae_gan_mark_tpu.train.schedule import PlateauState


def _meta_path(path: str) -> str:
    return os.path.join(path, "host_meta.json")


def _sync(tag: str) -> None:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(tag)


def save_checkpoint(root: str, name: str, state, epoch: int, best_val: float,
                    sched_g: PlateauState, sched_d: PlateauState,
                    lr_g: float, lr_d: float) -> str:
    """Write checkpoint ``root/name`` (atomic replace of any existing one).

    Multi-process: ``ckptr.save`` is a collective — every process must call
    it — while the host-side tmp-dir dance and the JSON sidecar are
    process-0-only, fenced by global barriers so no rank races ahead.
    """
    main = jax.process_index() == 0
    os.makedirs(root, exist_ok=True)
    path = os.path.abspath(os.path.join(root, name))
    ckptr = ocp.StandardCheckpointer()
    tmp = path + ".tmp"
    if main and os.path.exists(tmp):
        import shutil
        shutil.rmtree(tmp)
    _sync(f"pre_save_{name}_{epoch}")
    ckptr.save(tmp, state)
    ckptr.wait_until_finished()
    _sync(f"post_save_{name}_{epoch}")
    if main:
        with open(_meta_path(tmp), "w") as f:
            json.dump({
                "epoch": epoch,
                "best_val": best_val,
                "sched_g": dataclasses.asdict(sched_g),
                "sched_d": dataclasses.asdict(sched_d),
                "lr_g": lr_g,
                "lr_d": lr_d,
            }, f)
        if os.path.exists(path):
            import shutil
            shutil.rmtree(path)
        os.replace(tmp, path)
    _sync(f"done_save_{name}_{epoch}")
    if not main and not os.path.isdir(path):
        # Process 0 finalized the checkpoint (the barrier above proves it)
        # but this host cannot see it: the workdir is host-local storage.
        # Failing loudly here beats the alternative — non-zero ranks'
        # Orbax shards stranded in the .tmp dir and a later resume that
        # silently returns None on some hosts, desyncing the run.
        raise RuntimeError(
            f"process {jax.process_index()}: checkpoint {path} is not "
            f"visible after the save barrier — with process_count > 1 the "
            f"workdir must live on storage shared by all hosts (NFS/GCS).")
    return path


def restore_checkpoint(root: str, name: str,
                       abstract_state) -> Optional[Tuple[Any, Dict]]:
    """Restore ``root/name`` against an abstract/like-shaped TrainState.

    Returns (state, meta) or None if the checkpoint doesn't exist.
    """
    path = os.path.abspath(os.path.join(root, name))
    exists = os.path.isdir(path)
    if jax.process_count() > 1:
        # All ranks must agree the checkpoint exists: a rank on host-local
        # storage silently skipping resume while others restore would
        # desync the run. (Orbax restore itself is a collective.)
        from jax.experimental import multihost_utils
        import numpy as np
        all_exists = multihost_utils.process_allgather(
            np.asarray([exists], np.int32))
        if int(all_exists.min()) != int(all_exists.max()):
            raise RuntimeError(
                f"checkpoint {path} exists on some hosts but not others "
                f"(visible here: {exists}) — the workdir must live on "
                f"storage shared by all hosts (NFS/GCS).")
    if not exists:
        return None
    ckptr = ocp.StandardCheckpointer()
    target = jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_state)
    state = ckptr.restore(path, target)
    with open(_meta_path(path)) as f:
        meta = json.load(f)
    meta["sched_g"] = PlateauState(**meta["sched_g"])
    meta["sched_d"] = PlateauState(**meta["sched_d"])
    return state, meta
