"""Pallas TPU kernels.

Hot-op inventory honesty note: after the row-factored FiLM rewrite the step
is conv-dominated, and XLA's TPU conv emitter is already near-optimal — a
hand-written Pallas conv would not beat it. The kernels here target the
places XLA is structurally weaker:

* ``gru.py`` — the BiGRU sequence scan as one kernel: hidden state and
  recurrent weights stay resident in VMEM across all timesteps instead of
  round-tripping per ``lax.scan`` iteration; paired with a custom VJP whose
  backward is an analytically-derived reverse scan.
"""

from vae_gan_mark_tpu.ops.pallas.gru import pallas_gru_layer  # noqa: F401
