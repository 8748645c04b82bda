"""Import reference TF1 checkpoints into deepsignal_tpu variables.

The published model (``model.CpG.R9.4_1D.human_hx1.bn17.sn360``, README.md:88)
is a TF1 ``Saver`` checkpoint.  TensorFlow is not a dependency of this
framework, so import is a two-step path:

1. On any machine with TF1 installed, dump the checkpoint to an .npz with
   ``TF1_EXPORT_SNIPPET`` below (name -> array, exact graph names).
2. ``import_tf1_npz(npz_path, cfg)`` maps those arrays onto this framework's
   variable tree.

Weight-layout facts used (verified against deepsignal/model.py +
deepsignal/layers.py graph construction):

- LSTM: ``tf.contrib.rnn.LSTMCell`` kernel is [(D+H), 4H] with gate order
  (i, j, f, o) and zero bias — identical to ops/bilstm (FORGET_BIAS added at
  runtime by both).  Stack variables live under
  ``<prefix>em/{fw,bw}/multi_rnn_cell/cell_<L>/lstm_cell/{kernel,bias}``.
- Conv2d kernels are [1, k, cin, cout] -> squeeze to our (k, cin, cout).
- contrib batch_norm exposes beta/gamma/moving_mean/moving_variance ->
  flax BatchNorm bias/scale + batch_stats mean/var.
- The two ``tf.layers.dense`` calls of Joint_model create top-level
  ``dense/kernel`` [6032, 6032] and ``dense_1/kernel`` [6032, 2]
  (Fully_connected wraps them in tf.name_scope only, layers.py:75-77, which
  does not affect variable names).
- Embedding table: ``<prefix>embedding`` [1024, 128] (model.py:61).
"""

from __future__ import annotations

import re
from typing import Optional

import numpy as np

TF1_EXPORT_SNIPPET = '''
# Run with TF1 installed (e.g. the reference's own environment):
import numpy as np, tensorflow as tf
ckpt = "model.CpG.R9.4_1D.human_hx1.bn17.sn360/bn_17.sn_360.epoch_9.ckpt"
reader = tf.train.NewCheckpointReader(ckpt)
arrs = {name: reader.get_tensor(name)
        for name, _ in tf.train.list_variables(ckpt)}
np.savez("deepsignal_tf1_weights.npz", **arrs)
'''


def _find(arrs: dict, *substrings, shape=None) -> Optional[str]:
    """Find the unique variable whose name contains all substrings (and
    matches shape when given)."""
    hits = [k for k in arrs
            if all(s in k for s in substrings)
            and (shape is None or tuple(arrs[k].shape) == tuple(shape))]
    if len(hits) == 1:
        return hits[0]
    if len(hits) > 1:
        raise ValueError(f"ambiguous TF1 variables for {substrings}: {hits}")
    return None


def _require(arrs: dict, *substrings, shape=None) -> np.ndarray:
    k = _find(arrs, *substrings, shape=shape)
    if k is None:
        raise KeyError(f"TF1 checkpoint missing variable matching "
                       f"{substrings} (shape {shape})")
    return np.asarray(arrs[k])


def _map_conv_bn(arrs: dict, conv_sel: tuple, bn_sel: tuple, params: dict,
                 stats: dict, flax_conv: str = "Conv_0",
                 flax_bn: str = "BatchNorm_0") -> None:
    """Map one conv(+BN) pair (selected by name substrings) into a
    ConvBNRelu module dict (mutates params/stats in place)."""
    kernel = _require(arrs, *conv_sel, "kernel")
    if kernel.ndim == 4:  # [1, k, cin, cout] -> (k, cin, cout)
        kernel = kernel[0]
    params[flax_conv] = {"kernel": kernel}
    bn = {}
    bn_stats = {}
    for tf_name, ours, tree in (("beta", "bias", bn), ("gamma", "scale", bn),
                                ("moving_mean", "mean", bn_stats),
                                ("moving_variance", "var", bn_stats)):
        v = _find(arrs, *bn_sel, tf_name)
        if v is not None:
            tree[ours] = np.asarray(arrs[v])
    if bn:
        params[flax_bn] = bn
    if bn_stats:
        stats[flax_bn] = bn_stats


# TF branch scopes (layers.py:90-135): per branch, (conv name, our module
# name, bn scope inside the branch).  Conv names are unique per block; bn
# scopes are only unique within their branch scope.
_BRANCH_CONVS = [
    ("branch1_maxpooling", [("conv1a_1x1", "branch1_conv1a", "bn/")]),
    ("branch2_1x1", [("conv0b_1x1", "branch2_conv0b", "bn/")]),
    ("branch3_1x3", [("conv0c_1x1", "branch3_conv0c", "bn1/"),
                     ("conv1c_1x3", "branch3_conv1c", "bn2/")]),
    ("branch4_1x5", [("conv0d_1x1", "branch4_conv0d", "bn1/"),
                     ("conv1d_1x5", "branch4_conv1d", "bn2/")]),
    ("branch5_residual_1x3",
     [("convstem_1x1", "branch5_convstem", "bn0/"),
      ("conv0e_1x1", "branch5_conv0e", "bn1/"),
      ("conv1e_1x3", "branch5_conv1e", "bn2/"),
      ("conv2e_1x1", "branch5_conv2e", "bn3/")]),
]


def import_tf1_arrays(arrs: dict, cfg=None) -> dict:
    """Map a {tf1_name: array} dict onto this framework's variable tree.

    Returns {"params": ..., "batch_stats": ...} matching DeepSignalNet with
    the given ModelConfig (default config when None).
    """
    from ..core.config import ModelConfig
    cfg = cfg or ModelConfig()

    params: dict = {}
    stats: dict = {}

    if cfg.is_rnn and cfg.is_base:
        params["embedding"] = _require(
            arrs, "embedding", shape=(cfg.vocab_size, cfg.embedding_size))

    if cfg.is_rnn:
        event: dict = {}
        for direction in ("fw", "bw"):
            for layer in range(cfg.lstm_layers):
                kernel = _require(arrs, f"/{direction}/",
                                  f"cell_{layer}/", "kernel")
                bias = _require(arrs, f"/{direction}/", f"cell_{layer}/",
                                "bias")
                event[f"{direction}_{layer}"] = {"kernel": kernel,
                                                 "bias": bias}
        params["event_model"] = event

    if cfg.is_cnn:
        sig_params: dict = {}
        sig_stats: dict = {}
        for scope in ("conv_layer1", "conv_layer2", "conv_layer3"):
            p, s = {}, {}
            _map_conv_bn(arrs, (scope + "/", "conv/"),
                         (scope + "/", "bn/"), p, s)
            sig_params[scope] = p
            if s:
                sig_stats[scope] = s
        n_blocks = sum(cfg.inception_blocks)
        for i in range(1, n_blocks + 1):
            blk_p: dict = {}
            blk_s: dict = {}
            for branch_scope, convs in _BRANCH_CONVS:
                for conv_name, our_name, bn_scope in convs:
                    p, s = {}, {}
                    # TF scope: incp_layer<i>/<scopestr><i><branch>/<conv>
                    _map_conv_bn(
                        arrs, (f"incp_layer{i}/", f"{conv_name}/"),
                        (f"incp_layer{i}/", branch_scope, bn_scope), p, s)
                    blk_p[our_name] = p
                    if s:
                        blk_s[our_name] = s
            sig_params[f"incp_layer{i}"] = blk_p
            if blk_s:
                sig_stats[f"incp_layer{i}"] = blk_s
        params["signal_model"] = sig_params
        if sig_stats:
            stats["signal_model"] = sig_stats

    # joint head: identify dense kernels by shape
    dense_names = sorted(k for k in arrs
                         if re.search(r"dense(_\d+)?/kernel", k))
    if len(dense_names) < 2:
        raise KeyError("TF1 checkpoint missing joint-head dense kernels")
    fc1 = np.asarray(arrs[dense_names[0]])
    fc2 = np.asarray(arrs[dense_names[1]])
    if fc1.shape[1] == cfg.class_num:  # order swapped
        fc1, fc2 = fc2, fc1
    params["joint_model"] = {"fc1": {"kernel": fc1}, "fc2": {"kernel": fc2}}

    return {"params": params, "batch_stats": stats}


def import_tf1_npz(npz_path: str, cfg=None) -> dict:
    """Load a TF1-exported .npz (see TF1_EXPORT_SNIPPET) into variables."""
    with np.load(npz_path) as z:
        arrs = {k: z[k] for k in z.files}
    return import_tf1_arrays(arrs, cfg)


def _flatten(tree: dict, prefix=()) -> dict:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def export_tf1_style_arrays(variables: dict, cfg=None) -> dict:
    """Inverse mapping: our variable tree -> {tf1_name: array}.  Used for
    round-trip testing of the import mapping and for producing reference-
    shaped dumps from models trained here."""
    from ..core.config import ModelConfig
    cfg = cfg or ModelConfig()
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    arrs: dict = {}
    if "embedding" in params:
        arrs["modelembedding"] = np.asarray(params["embedding"])
    if "event_model" in params:
        for direction in ("fw", "bw"):
            for layer in range(cfg.lstm_layers):
                node = params["event_model"][f"{direction}_{layer}"]
                base = (f"modelem/{direction}/multi_rnn_cell/cell_{layer}/"
                        f"lstm_cell/")
                arrs[base + "kernel"] = np.asarray(node["kernel"])
                arrs[base + "bias"] = np.asarray(node["bias"])
    if "signal_model" in params:
        sp = params["signal_model"]
        ss = stats.get("signal_model", {})

        def put(branch_prefix, conv_name, bn_scope, node_p, node_s):
            arrs[branch_prefix + conv_name + "kernel"] = \
                np.asarray(node_p["Conv_0"]["kernel"])[None]
            if "BatchNorm_0" in node_p:
                arrs[branch_prefix + bn_scope + "beta"] = \
                    np.asarray(node_p["BatchNorm_0"]["bias"])
                arrs[branch_prefix + bn_scope + "gamma"] = \
                    np.asarray(node_p["BatchNorm_0"]["scale"])
            if node_s and "BatchNorm_0" in node_s:
                arrs[branch_prefix + bn_scope + "moving_mean"] = \
                    np.asarray(node_s["BatchNorm_0"]["mean"])
                arrs[branch_prefix + bn_scope + "moving_variance"] = \
                    np.asarray(node_s["BatchNorm_0"]["var"])

        for scope in ("conv_layer1", "conv_layer2", "conv_layer3"):
            put(f"modelsignalm{scope}/", "conv/", "bn/", sp[scope],
                ss.get(scope, {}))
        n_blocks = sum(cfg.inception_blocks)
        for i in range(1, n_blocks + 1):
            for branch_scope, convs in _BRANCH_CONVS:
                for conv_name, our_name, bn_scope in convs:
                    put(f"modelsignalmincp_layer{i}/modelsignalm{i}"
                        f"{branch_scope}/", f"{conv_name}/", bn_scope,
                        sp[f"incp_layer{i}"][our_name],
                        ss.get(f"incp_layer{i}", {}).get(our_name, {}))
    arrs["dense/kernel"] = np.asarray(
        params["joint_model"]["fc1"]["kernel"])
    arrs["dense_1/kernel"] = np.asarray(
        params["joint_model"]["fc2"]["kernel"])
    return arrs
