"""Fused LSTM recurrence as a Pallas TPU kernel.

The reference's BiLSTM (layers.py:20-72) is the one sequentially-dependent op
in the model: 17 steps x 3 layers x 2 directions.  The XLA baseline
(ops/bilstm.lstm_layer) emits 17 separate [B,H]x[H,4H] matmuls per
layer-direction with HBM round-trips for h/c between steps.  This kernel
keeps the recurrent state (h, c) and the recurrent weights W_h resident in
VMEM across the whole scan:

- grid = (batch_tiles, T); TPU grids execute sequentially, so VMEM scratch
  carries (h, c) across the T dimension; state resets at t == 0
- per step: one [bt, H] x [H, 4H] MXU matmul + VPU gate math
- the input projection x @ W_x stays outside (one large MXU matmul over all
  timesteps at once)
- ``reverse=True`` runs the time index map backwards, producing outputs in
  absolute time order exactly like the XLA path.

VMEM budget per step (bt=512, H=256, f32): W_h 1 MB + xp 2 MB + h/c/out
0.5 MB each ~= 4.5 MB — comfortably under the ~16 MB/core limit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..bilstm import FORGET_BIAS


def _lstm_scan_kernel(xp_ref, wh_ref, out_ref, h_scr, c_scr):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    # gate math in f32 scratch; matmul inputs in the model compute dtype
    # (bf16 mode: bf16 x bf16 -> f32 accumulate on the MXU)
    in_dtype = xp_ref.dtype
    gates = (xp_ref[0].astype(jnp.float32)
             + jnp.dot(h_scr[:].astype(in_dtype), wh_ref[:],
                       preferred_element_type=jnp.float32))
    i, j, f, o = jnp.split(gates, 4, axis=-1)
    c_new = (jax.nn.sigmoid(f + FORGET_BIAS) * c_scr[:]
             + jax.nn.sigmoid(i) * jnp.tanh(j))
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    h_scr[:] = h_new
    c_scr[:] = c_new
    out_ref[0] = h_new.astype(in_dtype)


@functools.partial(jax.jit, static_argnames=("reverse", "block_b",
                                             "interpret"))
def lstm_layer_pallas(x: jax.Array, kernel: jax.Array, bias: jax.Array,
                      reverse: bool = False, block_b: int = 512,
                      interpret: bool = False) -> jax.Array:
    """Drop-in replacement for ops.bilstm.lstm_layer (same TF cell math and
    [(D+H), 4H] kernel layout).  x: [B, T, D] -> outputs [B, T, H] in
    absolute time order.

    The batch is padded to a multiple of ``block_b`` lanes internally when
    needed (callers use fixed 512 batches, so this is usually a no-op).
    """
    b, t, d = x.shape
    h_dim = kernel.shape[1] // 4
    w_x = kernel[:d]
    w_h = kernel[d:]

    bt = min(block_b, b)
    pad = (-b) % bt
    xp = (x.reshape(b * t, d) @ w_x + bias).reshape(b, t, 4 * h_dim)
    if pad:
        xp = jnp.pad(xp, ((0, pad), (0, 0), (0, 0)))
    bp = xp.shape[0]
    xp = xp.transpose(1, 0, 2)  # [T, B, 4H], time-major

    def time_idx(i, tt):
        return ((t - 1 - tt) if reverse else tt, i, 0)

    out = pl.pallas_call(
        _lstm_scan_kernel,
        grid=(bp // bt, t),
        in_specs=[
            pl.BlockSpec((1, bt, 4 * h_dim), time_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h_dim, 4 * h_dim), lambda i, tt: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bt, h_dim), time_idx,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, bp, h_dim), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bt, h_dim), jnp.float32),
            pltpu.VMEM((bt, h_dim), jnp.float32),
        ],
        interpret=interpret,
    )(xp, w_h)

    out = out.transpose(1, 0, 2)
    if pad:
        out = out[:b]
    return out
