"""Value-level directional test of the TF1 checkpoint import (VERDICT r4 #3).

``tests/test_tf1_import.py`` verifies the import mapping at name/shape
granularity; this file closes the remaining ambiguity class — a mapping
that is shape-compatible but value-wrong (transposed square fc1, reordered
LSTM gate blocks, swapped fw/bw stacks, swapped BN mean/var) would pass
every shape test and silently change every call.

Method: a synthetic checkpoint in the EXACT published-model name space
(tests/fixtures/tf1_variables_bn17_sn360.json) filled with
asymmetry-breaking random values, forwarded two independent ways:

1. ``tf1_forward_raw`` below — computes the reference forward DIRECTLY
   from the raw TF1-named arrays using TF1 conventions (LSTMCell gate
   order (i, j, f, o) over ``concat([x, h]) @ kernel[(D+H), 4H]``,
   reference layers.py:35-44; conv kernels [1, k, cin, cout],
   layers.py:56-62; ``tf.layers.dense`` as ``x @ kernel[in, out]``,
   layers.py:75-77).  It shares NO code with models/tf1_import.py, so an
   import-mapping error cannot corrupt both sides identically.
2. The production path: ``import_tf1_arrays`` -> flax variables ->
   ``DeepSignalNet.apply``.

The two must agree; four deliberate value-level corruptions of the
checkpoint must each break the agreement (proving the test actually kills
the ambiguity classes it claims to).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsignal_tpu.core.config import ModelConfig
from deepsignal_tpu.models.deepsignal import DeepSignalNet
from deepsignal_tpu.models.tf1_import import import_tf1_arrays
from tests.net_oracle import (avg_pool_same_excl, bn_infer, conv1d_same,
                              lstm_layer_np, max_pool_same)


def _fixture_shapes():
    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "tf1_variables_bn17_sn360.json")
    with open(path) as f:
        return json.load(f)["variables"]


def _synth_checkpoint(seed=7):
    """Full-size synthetic TF1 checkpoint: fan-in-scaled random weights
    (keeps activations O(1) through 20+ layers so value comparisons are
    meaningful), strictly positive moving variances, near-1 gammas.  Every
    array is dense random — no symmetry for a transpose or gate reorder to
    hide behind."""
    rng = np.random.default_rng(seed)
    arrs = {}
    for name, shape in _fixture_shapes().items():
        if name.endswith("moving_variance"):
            a = rng.uniform(0.5, 1.5, shape)
        elif name.endswith("gamma"):
            a = rng.uniform(0.8, 1.2, shape)
        elif name.endswith(("beta", "moving_mean", "bias")):
            a = rng.normal(0, 0.1, shape)
        elif shape:
            fan_in = int(np.prod(shape[:-1]))
            a = rng.normal(0, 1.0 / np.sqrt(max(fan_in, 1)), shape)
        else:
            a = np.zeros(shape)
        arrs[name] = a.astype(np.float32)
    return arrs


def tf1_forward_raw(arrs, kmer, means, stds, sanums, signals,
                    lstm_layers=3, inception_blocks=(3, 5, 3)):
    """Reference forward from RAW TF1-named arrays, float64.

    Structure follows model.py:26-120 / layers.py:20-264 (the math helpers
    from net_oracle are TF1 op semantics, independent of the import
    mapping; all array *selection and layout interpretation* happens here,
    on the raw names)."""
    f64 = lambda a: np.asarray(a, dtype=np.float64)  # noqa: E731

    # --- event branch: embedding fusion + 3-layer BiLSTM (model.py:61-69)
    emb = f64(arrs["modelembedding"])[np.asarray(kmer)]
    fusion = np.concatenate([emb, f64(means)[..., None],
                             f64(stds)[..., None], f64(sanums)[..., None]],
                            axis=2)
    fw = bw = fusion
    for layer in range(lstm_layers):
        fw = lstm_layer_np(
            fw, arrs[f"modelem/fw/multi_rnn_cell/cell_{layer}"
                     f"/lstm_cell/kernel"],
            arrs[f"modelem/fw/multi_rnn_cell/cell_{layer}/lstm_cell/bias"],
            reverse=False)
        bw = lstm_layer_np(
            bw, arrs[f"modelem/bw/multi_rnn_cell/cell_{layer}"
                     f"/lstm_cell/kernel"],
            arrs[f"modelem/bw/multi_rnn_cell/cell_{layer}/lstm_cell/bias"],
            reverse=True)
    event = np.concatenate([fw[:, -1, :], bw[:, 0, :]], axis=1)

    # --- signal branch (layers.py:176-239)
    def cbr(x, conv_scope, bn_scope, stride=1, relu=True):
        k = f64(arrs[conv_scope + "kernel"])
        assert k.ndim == 4 and k.shape[0] == 1  # TF [1, k, cin, cout]
        y = conv1d_same(x, k[0], stride)
        y = bn_infer(y, arrs[bn_scope + "gamma"], arrs[bn_scope + "beta"],
                     arrs[bn_scope + "moving_mean"],
                     arrs[bn_scope + "moving_variance"])
        return np.maximum(y, 0.0) if relu else y

    x = f64(signals)[..., None]
    x = cbr(x, "modelsignalmconv_layer1/conv/",
            "modelsignalmconv_layer1/bn/", stride=2)
    x = max_pool_same(x, 3, 2)
    x = cbr(x, "modelsignalmconv_layer2/conv/",
            "modelsignalmconv_layer2/bn/")
    x = cbr(x, "modelsignalmconv_layer3/conv/",
            "modelsignalmconv_layer3/bn/")
    idx = 1
    for stage, n_blocks in enumerate(inception_blocks):
        if stage > 0:
            x = max_pool_same(x, 3, 2)
        for _ in range(n_blocks):
            p = f"modelsignalmincp_layer{idx}/modelsignalm{idx}"
            b1 = cbr(max_pool_same(x, 3, 1),
                     p + "branch1_maxpooling/conv1a_1x1/",
                     p + "branch1_maxpooling/bn/")
            b2 = cbr(x, p + "branch2_1x1/conv0b_1x1/",
                     p + "branch2_1x1/bn/")
            b3 = cbr(x, p + "branch3_1x3/conv0c_1x1/",
                     p + "branch3_1x3/bn1/")
            b3 = cbr(b3, p + "branch3_1x3/conv1c_1x3/",
                     p + "branch3_1x3/bn2/")
            b4 = cbr(x, p + "branch4_1x5/conv0d_1x1/",
                     p + "branch4_1x5/bn1/")
            b4 = cbr(b4, p + "branch4_1x5/conv1d_1x5/",
                     p + "branch4_1x5/bn2/")
            stem = cbr(x, p + "branch5_residual_1x3/convstem_1x1/",
                       p + "branch5_residual_1x3/bn0/", relu=False)
            b5 = cbr(x, p + "branch5_residual_1x3/conv0e_1x1/",
                     p + "branch5_residual_1x3/bn1/")
            b5 = cbr(b5, p + "branch5_residual_1x3/conv1e_1x3/",
                     p + "branch5_residual_1x3/bn2/")
            b5 = cbr(b5, p + "branch5_residual_1x3/conv2e_1x1/",
                     p + "branch5_residual_1x3/bn3/", relu=False)
            x = np.concatenate([b1, b2, b3, b4,
                                np.maximum(stem + b5, 0.0)], axis=-1)
            idx += 1
    x = avg_pool_same_excl(x, 7, 1)
    signal_out = x.reshape(x.shape[0], -1)

    # --- joint head: dense [in, out], x @ W (layers.py:242-264)
    joint = np.concatenate([event, signal_out], axis=1)
    return (joint @ f64(arrs["dense/kernel"])) @ f64(arrs["dense_1/kernel"])


@pytest.fixture(scope="module")
def _setup():
    arrs = _synth_checkpoint()
    cfg = ModelConfig()
    rng = np.random.default_rng(11)
    B, k, s = 2, cfg.kmer_len, cfg.cent_signals_len
    batch = dict(kmer=rng.integers(0, 4, (B, k)).astype(np.int32),
                 means=rng.normal(0, 1, (B, k)).astype(np.float32),
                 stds=np.abs(rng.normal(0, 1, (B, k))).astype(np.float32),
                 sanums=rng.integers(1, 40, (B, k)).astype(np.float32),
                 signals=rng.normal(0, 1, (B, s)).astype(np.float32))
    model = DeepSignalNet(cfg)
    fwd = jax.jit(lambda v, b: model.apply(
        v, b["kmer"], b["means"], b["stds"], b["sanums"], b["signals"],
        train=False))

    def run_import(a):
        imported = import_tf1_arrays(a, cfg)
        v = {"params": imported["params"],
             "batch_stats": imported["batch_stats"]}
        return np.asarray(fwd(jax.device_put(
            jax.tree.map(jnp.asarray, v)), batch), np.float64)

    oracle = tf1_forward_raw(arrs, **batch)
    return arrs, batch, run_import, oracle


def test_import_reproduces_tf1_forward(_setup):
    """The imported model must reproduce the raw-array TF1-semantics
    forward (f32 model vs f64 oracle tolerance)."""
    arrs, batch, run_import, oracle = _setup
    got = run_import(arrs)
    assert np.isfinite(oracle).all() and np.isfinite(got).all()
    np.testing.assert_allclose(got, oracle, rtol=2e-3, atol=2e-3)


def _assert_diverges(run_import, oracle, arrs2, what):
    got = run_import(arrs2)
    if not np.isfinite(got).all():
        return  # diverged to non-finite: unambiguously killed
    diff = float(np.max(np.abs(got - oracle)))
    # match tolerance is 2e-3; an order of magnitude above it is divergence
    assert diff > 0.02, (f"{what}: corrupted checkpoint still matched the "
                         f"oracle (max diff {diff:.2e}) — the test cannot "
                         f"kill this ambiguity class")


def test_kills_fc1_transpose(_setup):
    arrs, _, run_import, oracle = _setup
    arrs2 = dict(arrs)
    arrs2["dense/kernel"] = np.ascontiguousarray(arrs["dense/kernel"].T)
    _assert_diverges(run_import, oracle, arrs2, "fc1 transpose")


def test_kills_lstm_gate_reorder(_setup):
    """Swapping the j (cell input) and f (forget) gate column blocks is the
    shape-invisible gate-order mistake; the import must preserve
    (i, j, f, o)."""
    arrs, _, run_import, oracle = _setup
    arrs2 = dict(arrs)
    for direction in ("fw", "bw"):
        for layer in range(3):
            base = (f"modelem/{direction}/multi_rnn_cell/cell_{layer}"
                    f"/lstm_cell/")
            k = arrs[base + "kernel"]
            H = k.shape[1] // 4
            perm = np.concatenate(
                [np.arange(0, H), np.arange(2 * H, 3 * H),
                 np.arange(H, 2 * H), np.arange(3 * H, 4 * H)])
            arrs2[base + "kernel"] = np.ascontiguousarray(k[:, perm])
            arrs2[base + "bias"] = np.ascontiguousarray(
                arrs[base + "bias"][perm])
    _assert_diverges(run_import, oracle, arrs2, "lstm gate reorder")


def test_kills_fw_bw_swap(_setup):
    arrs, _, run_import, oracle = _setup
    arrs2 = dict(arrs)
    for layer in range(3):
        for leaf in ("kernel", "bias"):
            f = f"modelem/fw/multi_rnn_cell/cell_{layer}/lstm_cell/{leaf}"
            b = f"modelem/bw/multi_rnn_cell/cell_{layer}/lstm_cell/{leaf}"
            arrs2[f], arrs2[b] = arrs[b], arrs[f]
    _assert_diverges(run_import, oracle, arrs2, "fw/bw swap")


def test_kills_bn_mean_var_swap(_setup):
    """moving_mean/moving_variance are same-shaped; swapping them in the
    stem BN must break parity (variances were drawn in [0.5, 1.5] and means
    near 0, so the corrupted version stays finite but wrong)."""
    arrs, _, run_import, oracle = _setup
    arrs2 = dict(arrs)
    m = "modelsignalmconv_layer1/bn/moving_mean"
    v = "modelsignalmconv_layer1/bn/moving_variance"
    arrs2[m], arrs2[v] = arrs[v], arrs[m]
    _assert_diverges(run_import, oracle, arrs2, "bn mean/var swap")
