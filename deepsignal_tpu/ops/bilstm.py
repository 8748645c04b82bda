"""LSTM recurrence ops.

The reference's BiLSTM is ``tf.contrib.rnn.LSTMCell`` stacks run through
``tf.nn.bidirectional_dynamic_rnn`` (deepsignal/layers.py:20-72).  The TPU
re-design splits each layer into:

- one large input projection ``x @ Wx`` over the whole sequence (a single
  [B*T, D] x [D, 4H] matmul -> MXU-friendly), and
- a ``lax.scan`` over the k time steps carrying (h, c), each step doing the
  [B, H] x [H, 4H] recurrent matmul.

Cell math matches TF1 ``LSTMCell`` exactly (gate order i, j, f, o;
``forget_bias`` added to f; no peepholes), so imported reference checkpoints
drop in without permutation.

``lstm_layer`` is the XLA baseline; ``deepsignal_tpu.ops.pallas`` provides a
fused VMEM-resident kernel with the same signature for the hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


FORGET_BIAS = 1.0  # tf.contrib.rnn.LSTMCell default


def lstm_cell_step(h, c, gates):
    """One LSTM step given pre-activation gates [B, 4H] (order i, j, f, o)."""
    i, j, f, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f + FORGET_BIAS) * c + jax.nn.sigmoid(i) * jnp.tanh(j)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def lstm_layer(x: jax.Array, kernel: jax.Array, bias: jax.Array,
               reverse: bool = False) -> jax.Array:
    """Run one unidirectional LSTM layer over a [B, T, D] sequence.

    ``kernel`` is the TF-layout [(D+H), 4H] matrix, ``bias`` [4H].
    Returns outputs [B, T, H] in forward time order; with ``reverse=True``
    the recurrence runs T-1 -> 0 (outputs still indexed by absolute time, so
    ``out[:, 0]`` is the final step of the reversed scan — exactly what
    Event_model's ``rnn_out[1][:, 0, :]`` reads, layers.py:171-172).
    """
    b, t, d = x.shape
    h_dim = kernel.shape[1] // 4
    w_x = kernel[:d]
    w_h = kernel[d:]
    # big batched input projection: [B*T, D] @ [D, 4H]
    xp = (x.reshape(b * t, d) @ w_x + bias).reshape(b, t, 4 * h_dim)

    def step(carry, xp_t):
        h, c = carry
        gates = xp_t + h @ w_h
        h, c = lstm_cell_step(h, c, gates)
        return (h, c), h

    init = (jnp.zeros((b, h_dim), dtype=x.dtype),
            jnp.zeros((b, h_dim), dtype=x.dtype))
    _, outs = jax.lax.scan(step, init, xp.transpose(1, 0, 2), reverse=reverse)
    return outs.transpose(1, 0, 2)


def bilstm_encoder_xla(x: jax.Array, kernels_fw, biases_fw, kernels_bw,
                       biases_bw) -> jax.Array:
    """Stacked bidirectional encoder, [B, T, D] -> [B, 2H]: independent
    fw/bw stacks, output = concat(fw[:, -1], bw[:, 0]) (Event_model,
    reference layers.py:142-173).  lax.scan baseline; the fused Pallas
    version (ops.pallas.bilstm_encoder_fused) uses this for its backward
    pass, so the two must stay semantically identical."""
    fw, bw = x, x
    for kf, bf, kb, bb in zip(kernels_fw, biases_fw, kernels_bw, biases_bw):
        fw = lstm_layer(fw, kf, bf, reverse=False)
        bw = lstm_layer(bw, kb, bb, reverse=True)
    return jnp.concatenate([fw[:, -1, :], bw[:, 0, :]], axis=1)
