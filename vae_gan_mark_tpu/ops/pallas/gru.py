"""GRU sequence scan as a single Pallas TPU kernel + custom VJP.

Forward: one ``pallas_call`` holds the recurrent weights (H, 3H), the bias,
and the hidden state in VMEM for the entire sequence; the loop body does one
(B, H) @ (H, 3H) MXU matmul plus VPU gate math per timestep and writes the
output row. Compare ``ops/rnn.py:GRULayer`` (lax.scan), whose per-iteration
carries round-trip through XLA's loop state.

Backward: Pallas kernels are not auto-differentiable, so the layer is a
``jax.custom_vjp``: residuals are the forward outputs (the h_t sequence —
already computed, nothing extra saved), and the backward pass recomputes the
gates analytically in a plain ``lax.scan`` reverse loop (exactly what
autodiff of the scan would do, minus the stored-primal memory).

Gate math is torch's (r, z, n ordering; see ops/rnn.py docstring). Inputs
are the *precomputed* input projections x_proj = x @ W_ih + b_ih, time-major
(L, B, 3H) — the big input matmul stays outside where XLA batches it best.

VMEM budget: x_proj (L*B*3H), outputs (L*B*H), weights (H*3H) all f32 must
fit in ~16 MB; for the reference text encoder (L=60, H=256) that holds up to
B≈50. ``fits_vmem`` guards the dispatch; callers fall back to the scan path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_BUDGET_BYTES = 14 * 1024 * 1024


def fits_vmem(length: int, batch: int, hidden: int) -> bool:
    h3 = 3 * hidden
    need = 4 * (length * batch * h3        # x_proj
                + length * batch * hidden  # outputs
                + hidden * h3 + h3         # weights + bias
                + 2 * batch * h3           # gate temporaries
                + batch * hidden)          # hidden state
    return need < VMEM_BUDGET_BYTES


def _gru_kernel(xproj_ref, whh_ref, bhh_ref, out_ref, h_scratch):
    length = xproj_ref.shape[0]
    hidden = h_scratch.shape[1]
    h_scratch[:] = jnp.zeros_like(h_scratch)

    def body(t, _):
        xp = xproj_ref[t]                                  # (B, 3H)
        hp = jnp.dot(h_scratch[:], whh_ref[:],
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32) + bhh_ref[:]
        xr = xp[:, :hidden]
        xz = xp[:, hidden:2 * hidden]
        xn = xp[:, 2 * hidden:]
        hr = hp[:, :hidden]
        hz = hp[:, hidden:2 * hidden]
        hn = hp[:, 2 * hidden:]
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        new_h = (1.0 - z) * n + z * h_scratch[:]
        h_scratch[:] = new_h
        out_ref[t] = new_h
        return 0

    jax.lax.fori_loop(0, length, body, 0)


def _forward_impl(x_proj, w_hh, b_hh, interpret):
    length, batch, h3 = x_proj.shape
    hidden = h3 // 3
    return pl.pallas_call(
        _gru_kernel,
        out_shape=jax.ShapeDtypeStruct((length, batch, hidden), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((batch, hidden), jnp.float32)],
        interpret=interpret,
    )(x_proj.astype(jnp.float32), w_hh.astype(jnp.float32),
      b_hh.astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def pallas_gru_layer(x_proj, w_hh, b_hh, interpret=False):
    """(L, B, 3H) time-major input projections -> (L, B, H) hidden states."""
    return _forward_impl(x_proj, w_hh, b_hh, interpret)


def _fwd(x_proj, w_hh, b_hh, interpret):
    outs = _forward_impl(x_proj, w_hh, b_hh, interpret)
    return outs, (x_proj, w_hh, b_hh, outs)


def _bwd(interpret, residuals, g):
    x_proj, w_hh, b_hh, outs = residuals
    length, batch, h3 = x_proj.shape
    hidden = h3 // 3
    w = w_hh.astype(jnp.float32)
    b = b_hh.astype(jnp.float32)
    # h_{t-1} sequence: zeros at t=0, else outs[t-1].
    h_prev_seq = jnp.concatenate(
        [jnp.zeros((1, batch, hidden), jnp.float32), outs[:-1]], axis=0)

    def step(carry, inputs):
        dh_next = carry                       # dL/dh_t accumulated
        xp, h_prev, g_t = inputs
        dh = dh_next + g_t
        hp = jnp.dot(h_prev, w, precision=jax.lax.Precision.HIGHEST) + b
        xr, xz, xn = xp[:, :hidden], xp[:, hidden:2 * hidden], xp[:, 2 * hidden:]
        hr, hz, hn = hp[:, :hidden], hp[:, hidden:2 * hidden], hp[:, 2 * hidden:]
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        dn = dh * (1.0 - z)
        dz = dh * (h_prev - n)
        dh_prev = dh * z
        dn_pre = dn * (1.0 - jnp.square(n))
        dr = dn_pre * hn
        dhn_pre = dn_pre * r
        dr_pre = dr * r * (1.0 - r)
        dz_pre = dz * z * (1.0 - z)
        dxp = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=1)
        dhp = jnp.concatenate([dr_pre, dz_pre, dhn_pre], axis=1)
        dh_prev = dh_prev + jnp.dot(dhp, w.T,
                                    precision=jax.lax.Precision.HIGHEST)
        dw = jnp.einsum("bh,bk->hk", h_prev, dhp,
                        precision=jax.lax.Precision.HIGHEST)
        return dh_prev, (dxp, dw, jnp.sum(dhp, axis=0))

    g = g.astype(jnp.float32)
    init = jnp.zeros((batch, hidden), jnp.float32)
    _, (dxp_seq, dw_seq, db_seq) = jax.lax.scan(
        step, init, (x_proj.astype(jnp.float32), h_prev_seq, g),
        reverse=True)
    return (dxp_seq.astype(x_proj.dtype),
            jnp.sum(dw_seq, axis=0).astype(w_hh.dtype),
            jnp.sum(db_seq, axis=0).astype(b_hh.dtype))


pallas_gru_layer.defvjp(_fwd, _bwd)
