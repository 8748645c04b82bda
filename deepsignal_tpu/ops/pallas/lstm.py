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

from ..bilstm import FORGET_BIAS, bilstm_encoder_xla


def _cell(gates, c, forget_bias):
    i, j, f, o = jnp.split(gates, 4, axis=-1)
    c_new = (jax.nn.sigmoid(f + forget_bias) * c
             + jax.nn.sigmoid(i) * jnp.tanh(j))
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def _encoder_kernel(xpf_ref, xpb_ref, wh0f_ref, k1f_ref, k2f_ref,
                    wh0b_ref, k1b_ref, k2b_ref, b_ref, out_ref, state_scr):
    """One grid step = one timestep of all 6 layer-directions.

    grid = (batch_tiles, T); ``state_scr`` is [12, bt, H] float32 carrying
    (h, c) x (3 layers) x (fw, bw) across the sequential T dimension.
    ``xpf``/``xpb`` are the layer-0 input projections, time-indexed forward /
    reversed, so at grid step t the fw stack sees absolute time t and the bw
    stack sees absolute time T-1-t (both stacks advance their own recurrence
    in processing order).  The encoder output (last fw step, first bw step —
    layers.py:169-173 via Event_model) is written at the final grid step.
    """
    t = pl.program_id(1)
    n_t = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        state_scr[:] = jnp.zeros_like(state_scr)

    dt = xpf_ref.dtype

    def stack(xp, wh0, k1, k2, base):
        """Advance one direction's 3-layer stack by one step."""
        h_dim = wh0.shape[0]
        h0, c0 = state_scr[base + 0], state_scr[base + 1]
        h1, c1 = state_scr[base + 2], state_scr[base + 3]
        h2, c2 = state_scr[base + 4], state_scr[base + 5]
        g0 = xp.astype(jnp.float32) + jnp.dot(
            h0.astype(dt), wh0, preferred_element_type=jnp.float32)
        h0, c0 = _cell(g0, c0, FORGET_BIAS)
        # layer kernels keep the TF [(D+H), 4H] layout: rows [:H] multiply
        # the lower layer's output, rows [H:] the own recurrent state
        g1 = (b_ref[base // 6 * 2 + 0].astype(jnp.float32)
              + jnp.dot(h0.astype(dt), k1[:h_dim],
                        preferred_element_type=jnp.float32)
              + jnp.dot(h1.astype(dt), k1[h_dim:],
                        preferred_element_type=jnp.float32))
        h1, c1 = _cell(g1, c1, FORGET_BIAS)
        g2 = (b_ref[base // 6 * 2 + 1].astype(jnp.float32)
              + jnp.dot(h1.astype(dt), k2[:h_dim],
                        preferred_element_type=jnp.float32)
              + jnp.dot(h2.astype(dt), k2[h_dim:],
                        preferred_element_type=jnp.float32))
        h2, c2 = _cell(g2, c2, FORGET_BIAS)
        state_scr[base + 0], state_scr[base + 1] = h0, c0
        state_scr[base + 2], state_scr[base + 3] = h1, c1
        state_scr[base + 4], state_scr[base + 5] = h2, c2
        return h2

    h2f = stack(xpf_ref[0], wh0f_ref[:], k1f_ref[:], k2f_ref[:], 0)
    h2b = stack(xpb_ref[0], wh0b_ref[:], k1b_ref[:], k2b_ref[:], 6)

    @pl.when(t == n_t - 1)
    def _():
        h_dim = wh0f_ref.shape[0]
        out_ref[:, :h_dim] = h2f.astype(out_ref.dtype)
        out_ref[:, h_dim:] = h2b.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def bilstm_encoder_pallas(x: jax.Array, kernels_fw, biases_fw, kernels_bw,
                          biases_bw, block_b: int = 128,
                          interpret: bool = False) -> jax.Array:
    """Fused 3-layer bidirectional LSTM encoder: [B, T, D] -> [B, 2H].

    Equivalent to running ops.bilstm.lstm_layer six times (3 stacked layers x
    fw/bw) and taking concat(fw[:, -1], bw[:, 0]) — the inference path of
    BiLSTMEncoder (reference Event_model, layers.py:142-173) — but in ONE
    pallas_call: recurrent weights (~5 MB), biases, and all 12 state tensors
    stay VMEM-resident for the whole scan, and the 4 inter-layer [B, T, H]
    activations never touch HBM.  Only layer 0's input projection (one large
    MXU matmul per direction) is computed outside.

    kernels/biases: per-direction lists of 3 TF-layout [(D_l+H), 4H] / [4H].
    """
    b, t, d = x.shape
    h_dim = kernels_fw[0].shape[1] // 4
    assert all(k.shape == (2 * h_dim, 4 * h_dim)
               for k in (kernels_fw[1], kernels_fw[2], kernels_bw[1],
                         kernels_bw[2]))

    bt = min(block_b, b)
    pad = (-b) % bt

    def xp0(kern, bias):
        w_x = kern[:d]
        xp = (x.reshape(b * t, d) @ w_x + bias).reshape(b, t, 4 * h_dim)
        if pad:
            xp = jnp.pad(xp, ((0, pad), (0, 0), (0, 0)))
        return xp.transpose(1, 0, 2)  # [T, B, 4H]

    xpf = xp0(kernels_fw[0], biases_fw[0])
    xpb = xp0(kernels_bw[0], biases_bw[0])
    bp = xpf.shape[1]
    # upper-layer biases, stacked [4, 4H]: fw1, fw2, bw1, bw2
    b_upper = jnp.stack([biases_fw[1], biases_fw[2],
                         biases_bw[1], biases_bw[2]]).astype(jnp.float32)

    wh0f = kernels_fw[0][d:]
    wh0b = kernels_bw[0][d:]

    out = pl.pallas_call(
        _encoder_kernel,
        grid=(bp // bt, t),
        in_specs=[
            pl.BlockSpec((1, bt, 4 * h_dim), lambda i, tt: (tt, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, 4 * h_dim),
                         lambda i, tt, _t=t: (_t - 1 - tt, i, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec(w.shape, lambda i, tt: (0, 0),
                         memory_space=pltpu.VMEM)
            for w in (wh0f, kernels_fw[1], kernels_fw[2],
                      wh0b, kernels_bw[1], kernels_bw[2])
        ] + [
            pl.BlockSpec(b_upper.shape, lambda i, tt: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, 2 * h_dim), lambda i, tt: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, 2 * h_dim), x.dtype),
        scratch_shapes=[pltpu.VMEM((12, bt, h_dim), jnp.float32)],
        interpret=interpret,
    )(xpf, xpb, wh0f, kernels_fw[1], kernels_fw[2],
      wh0b, kernels_bw[1], kernels_bw[2], b_upper)

    if pad:
        out = out[:b]
    return out


@jax.custom_vjp
def bilstm_encoder_fused(x, kernels_fw, biases_fw, kernels_bw, biases_bw):
    """Differentiable fused encoder: Pallas forward, lax.scan backward.

    The forward pass is the VMEM-resident kernel (bilstm_encoder_pallas);
    the backward pass recomputes through the XLA implementation
    (ops.bilstm.bilstm_encoder_xla) — bit-equal cell math, so gradients are
    exactly the gradients of the XLA encoder.  17-step recompute costs one
    extra forward (~the standard rematerialization trade)."""
    return bilstm_encoder_pallas(x, tuple(kernels_fw), tuple(biases_fw),
                                 tuple(kernels_bw), tuple(biases_bw),
                                 interpret=jax.default_backend() != "tpu")


def _fused_fwd(x, kernels_fw, biases_fw, kernels_bw, biases_bw):
    out = bilstm_encoder_fused(x, kernels_fw, biases_fw, kernels_bw,
                               biases_bw)
    return out, (x, kernels_fw, biases_fw, kernels_bw, biases_bw)


def _fused_bwd(res, g):
    _, vjp = jax.vjp(bilstm_encoder_xla, *res)
    return vjp(g)


bilstm_encoder_fused.defvjp(_fused_fwd, _fused_bwd)


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
