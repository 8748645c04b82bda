"""Float64 numpy oracle of the ENTIRE reference network.

Every function re-implements the exact TF1 op semantics the reference uses
(/root/reference/deepsignal/model.py:26-120, layers.py:20-264) directly in
numpy float64 — independently of the flax code under test:

- ``tf.layers.conv2d(padding='SAME', use_bias=False)``: SAME padding is the
  TF/XLA formula (pad_total = max((ceil(L/s)-1)*s + K - L, 0), left =
  pad_total // 2 — asymmetric, extra on the RIGHT when odd).
- ``tf.contrib.layers.batch_norm`` at inference (layers.py:80-84):
  y = scale * (x - moving_mean) / sqrt(moving_var + eps) + bias, eps=1e-3.
- ``tf.layers.max_pooling2d / average_pooling2d`` SAME: max pads with -inf;
  average EXCLUDES padded positions from the denominator.
- ``tf.contrib.rnn.LSTMCell`` (layers.py:35-44): concat([x, h]) @ kernel +
  bias, gate order (i, j, f, o), c' = sigmoid(f + forget_bias)*c +
  sigmoid(i)*tanh(j), h' = sigmoid(o)*tanh(c'), forget_bias = 1.0.
- ``tf.nn.bidirectional_dynamic_rnn`` 3-layer stacks + Event_model readout
  concat(fw[:, -1], bw[:, 0]) (layers.py:142-173).
- ``tf.layers.dense(use_bias=False)`` joint head (layers.py:242-264); the
  dropout-after-logits quirk is identity at inference.
- sigmoid head + renormalized probs (model.py:99-100,
  call_modifications.py:185-187).

``oracle_forward`` runs the full net from a flax variables pytree and
returns named intermediates keyed to the flax module tree, so the parity
test can assert layer-by-layer as well as end-to-end.
"""

from __future__ import annotations

import numpy as np


def _f64(a):
    return np.asarray(a, dtype=np.float64)


def tf_same_pads(length: int, window: int, stride: int):
    """TF 'SAME' pad split: asymmetric, extra on the right (TF conv_ops)."""
    out_len = -(-length // stride)
    pad = max((out_len - 1) * stride + window - length, 0)
    return pad // 2, pad - pad // 2


def _windows(x: np.ndarray, window: int, stride: int, pad_value: float):
    """[B, L, C] -> [B, Lout, window, C] sliding windows under SAME padding."""
    b, length, c = x.shape
    pl, pr = tf_same_pads(length, window, stride)
    xp = np.full((b, length + pl + pr, c), pad_value, dtype=x.dtype)
    xp[:, pl:pl + length] = x
    out_len = -(-length // stride)
    idx = np.arange(out_len)[:, None] * stride + np.arange(window)[None, :]
    return xp[:, idx, :]


def conv1d_same(x, kernel, stride: int = 1):
    """tf.layers.conv2d([1,K], SAME, no bias) on [B, L, Cin]; kernel
    [K, Cin, Cout] (flax layout, identical math to TF's [1,K,Cin,Cout])."""
    x, kernel = _f64(x), _f64(kernel)
    win = _windows(x, kernel.shape[0], stride, 0.0)
    return np.einsum("blkc,kco->blo", win, kernel, optimize=True)


def bn_infer(x, scale, bias, mean, var, eps: float = 1e-3):
    """tf.contrib.layers.batch_norm inference (decay irrelevant here)."""
    return (_f64(x) - _f64(mean)) / np.sqrt(_f64(var) + eps) * _f64(scale) \
        + _f64(bias)


def max_pool_same(x, window: int = 3, stride: int = 1):
    return _windows(_f64(x), window, stride, -np.inf).max(axis=2)


def avg_pool_same_excl(x, window: int = 7, stride: int = 1):
    """TF average_pooling2d SAME: padded positions excluded from the mean."""
    x = _f64(x)
    win = _windows(x, window, stride, 0.0)
    ones = np.ones((1, x.shape[1], 1), dtype=np.float64)
    counts = _windows(ones, window, stride, 0.0).sum(axis=2)
    return win.sum(axis=2) / counts


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-_f64(x)))


def lstm_layer_np(x, kernel, bias, reverse: bool = False,
                  forget_bias: float = 1.0):
    """One tf.contrib.rnn.LSTMCell layer over [B, T, D] (layers.py:35-44).

    Outputs [B, T, H] indexed by absolute time (dynamic_rnn semantics: the
    reverse direction's final state lands at index 0)."""
    x, kernel, bias = _f64(x), _f64(kernel), _f64(bias)
    b, t, d = x.shape
    h_dim = kernel.shape[1] // 4
    h = np.zeros((b, h_dim))
    c = np.zeros((b, h_dim))
    out = np.zeros((b, t, h_dim))
    steps = range(t - 1, -1, -1) if reverse else range(t)
    for ti in steps:
        gates = np.concatenate([x[:, ti], h], axis=1) @ kernel + bias
        i, j, f, o = np.split(gates, 4, axis=1)
        c = sigmoid(f + forget_bias) * c + sigmoid(i) * np.tanh(j)
        h = sigmoid(o) * np.tanh(c)
        out[:, ti] = h
    return out


def conv_bn_relu(x, p, stats, stride: int = 1, relu: bool = True):
    """The repeated conv->BN(->relu) motif; p/stats are flax param subtrees."""
    y = conv1d_same(x, p["Conv_0"]["kernel"], stride)
    y = bn_infer(y, p["BatchNorm_0"]["scale"], p["BatchNorm_0"]["bias"],
                 stats["BatchNorm_0"]["mean"], stats["BatchNorm_0"]["var"])
    return np.maximum(y, 0.0) if relu else y


def inception_block_np(x, p, stats):
    """inception_layer (layers.py:87-139): 5 branches -> concat."""
    b1 = max_pool_same(x, 3, 1)
    b1 = conv_bn_relu(b1, p["branch1_conv1a"], stats["branch1_conv1a"])
    b2 = conv_bn_relu(x, p["branch2_conv0b"], stats["branch2_conv0b"])
    b3 = conv_bn_relu(x, p["branch3_conv0c"], stats["branch3_conv0c"])
    b3 = conv_bn_relu(b3, p["branch3_conv1c"], stats["branch3_conv1c"])
    b4 = conv_bn_relu(x, p["branch4_conv0d"], stats["branch4_conv0d"])
    b4 = conv_bn_relu(b4, p["branch4_conv1d"], stats["branch4_conv1d"])
    stem = conv_bn_relu(x, p["branch5_convstem"], stats["branch5_convstem"],
                        relu=False)
    b5 = conv_bn_relu(x, p["branch5_conv0e"], stats["branch5_conv0e"])
    b5 = conv_bn_relu(b5, p["branch5_conv1e"], stats["branch5_conv1e"])
    b5 = conv_bn_relu(b5, p["branch5_conv2e"], stats["branch5_conv2e"],
                      relu=False)
    b5 = np.maximum(stem + b5, 0.0)
    return np.concatenate([b1, b2, b3, b4, b5], axis=-1)


def oracle_forward(variables, kmer, means, stds, sanums, signals,
                   inception_blocks=(3, 5, 3), lstm_layers: int = 3,
                   is_rnn: bool = True, is_base: bool = True,
                   is_cnn: bool = True):
    """Full inference forward (model.py:26-120).  Returns a dict of named
    activations keyed like the flax intermediates tree."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    acts = {}

    event_out = None
    if is_rnn:
        if is_base:
            emb = _f64(params["embedding"])[np.asarray(kmer)]  # [B,K,128]
            fusion = np.concatenate(
                [emb, _f64(means)[..., None], _f64(stds)[..., None],
                 _f64(sanums)[..., None]], axis=2)  # model.py:64-69
        else:
            fusion = np.stack([_f64(means), _f64(stds), _f64(sanums)], axis=2)
        fw, bw = fusion, fusion
        ep = params["event_model"]
        for layer in range(lstm_layers):
            fw = lstm_layer_np(fw, ep[f"fw_{layer}"]["kernel"],
                               ep[f"fw_{layer}"]["bias"], reverse=False)
            bw = lstm_layer_np(bw, ep[f"bw_{layer}"]["kernel"],
                               ep[f"bw_{layer}"]["bias"], reverse=True)
            acts[f"event_model/fw_{layer}"] = fw
            acts[f"event_model/bw_{layer}"] = bw
        # Event_model readout (layers.py:169-173)
        event_out = np.concatenate([fw[:, -1, :], bw[:, 0, :]], axis=1)
        acts["event_model"] = event_out

    signal_out = None
    if is_cnn:
        sp = params["signal_model"]
        ss = stats["signal_model"]
        x = _f64(signals)[..., None]  # [B, S, 1]
        x = conv_bn_relu(x, sp["conv_layer1"], ss["conv_layer1"], stride=2)
        acts["signal_model/conv_layer1"] = x
        x = max_pool_same(x, 3, 2)
        x = conv_bn_relu(x, sp["conv_layer2"], ss["conv_layer2"])
        acts["signal_model/conv_layer2"] = x
        x = conv_bn_relu(x, sp["conv_layer3"], ss["conv_layer3"])
        acts["signal_model/conv_layer3"] = x
        idx = 1
        for stage, n_blocks in enumerate(inception_blocks):
            if stage > 0:
                x = max_pool_same(x, 3, 2)
            for _ in range(n_blocks):
                x = inception_block_np(x, sp[f"incp_layer{idx}"],
                                       ss[f"incp_layer{idx}"])
                acts[f"signal_model/incp_layer{idx}"] = x
                idx += 1
        x = avg_pool_same_excl(x, 7, 1)
        signal_out = x.reshape(x.shape[0], -1)  # NHWC flatten (layers.py:236)
        acts["signal_model"] = signal_out

    if signal_out is not None and event_out is not None:
        joint = np.concatenate([event_out, signal_out], axis=1)
    elif signal_out is not None:
        joint = signal_out
    else:
        joint = event_out
    jp = params["joint_model"]
    fc1 = joint @ _f64(jp["fc1"]["kernel"])
    acts["joint_model/fc1"] = fc1
    logits = fc1 @ _f64(jp["fc2"]["kernel"])
    acts["joint_model"] = logits
    acts["logits"] = logits

    act = sigmoid(logits)  # model.py:99-100
    total = act[:, 0] + act[:, 1]
    acts["prob_0"] = act[:, 0] / total  # call_modifications.py:185-187
    acts["prob_1"] = act[:, 1] / total
    acts["prediction"] = np.argmax(act, axis=1)  # model.py:108-110
    return acts
