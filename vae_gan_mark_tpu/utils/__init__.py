"""Shared utilities: profiling, tree helpers, debug guards."""

from vae_gan_mark_tpu.utils.profiling import (  # noqa: F401
    StepTimer, trace)
from vae_gan_mark_tpu.utils.debug import enable_nan_debugging  # noqa: F401
