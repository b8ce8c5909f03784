"""Debug guards — the TPU-era equivalent of the reference's
``torch.autograd.set_detect_anomaly(True)`` (vae-gan-v2.py:1028).

``enable_nan_debugging()`` turns on jax's NaN checker (every jitted function
re-runs in op-by-op mode when a NaN appears, pinpointing the producing op).
The Trainer's per-step NaN guard (train/loop.py) is the cheap always-on
layer; this is the heavyweight localizer to flip on when it trips.
"""

from __future__ import annotations

import jax


def enable_nan_debugging(enable: bool = True):
    jax.config.update("jax_debug_nans", enable)
