"""Multi-process (multi-host) execution support (SURVEY.md §2.12).

The reference is strictly single-device (no torch.distributed anywhere); the
TPU-native scope is: one process per host, each seeing its local chips, with

  * ``jax.distributed.initialize`` wiring the processes into one runtime
    (ICI/DCN collectives are then inserted by XLA exactly as in the
    single-process mesh path — the train step code is unchanged);
  * per-process batch construction: each process loads only its rows and
    ``jax.make_array_from_process_local_data`` assembles the global
    batch-sharded array.

Semantics: the jitted step computes global-batch means, so an N-process run
equals one large-batch single-process run (asserted by
tests/test_multiprocess.py on a 2-process x 4-device CPU fixture, the
standard way to exercise this without a multi-host TPU slice).
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from vae_gan_mark_tpu.parallel.mesh import batch_sharding


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the cross-process runtime. No-op for single-process runs.

    Arguments fall back to ``JAX_COORDINATOR_ADDRESS`` /
    ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` (and on TPU pods to JAX's
    own auto-detection when called with no arguments and the env announces
    a multi-host slice).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return  # single process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def process_local_slice(global_batch_size: int) -> slice:
    """Rows of the global batch this process is responsible for loading.

    The 'data' mesh axis enumerates devices process-major (make_mesh lays
    out jax.devices(), which sorts by process), so contiguous row blocks
    per process line up with the device sharding.
    """
    n = jax.process_count()
    assert global_batch_size % n == 0, (global_batch_size, n)
    per = global_batch_size // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def global_batch_from_local(local_batch: dict, mesh) -> dict:
    """Per-process local rows -> global batch-sharded jax.Arrays.

    ``local_batch`` holds this process's rows only (host numpy); the result
    behaves exactly like ``shard_batch`` output in the single-process path.
    Host-only keys (raw_text) must be stripped by the caller.
    """
    sharding = batch_sharding(mesh)
    return {k: jax.make_array_from_process_local_data(sharding, v)
            for k, v in local_batch.items()}
