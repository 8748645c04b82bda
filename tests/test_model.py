"""Model forward/objective semantics vs reference contracts
(deepsignal/model.py, deepsignal/layers.py).

Shape/wiring checks use jax.eval_shape (abstract — no XLA compile, critical
on the 2-core test machine); numerics are covered by the small-config
execution tests + the LSTM-cell oracle.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepsignal_tpu.core.config import ModelConfig
from deepsignal_tpu.models.deepsignal import (
    DeepSignalNet, forward_with_loss, normalized_probs,
    predictions, weighted_ce_with_logits)
from deepsignal_tpu.ops.bilstm import lstm_layer

TINY = dict(lstm_hidden=8, lstm_layers=1, inception_times=1,
            inception_blocks=(1, 1, 1),
            cent_signals_len=24, kmer_len=5)


def _abstract_batch(b=4, k=17, s=360):
    return dict(
        kmer=jax.ShapeDtypeStruct((b, k), jnp.int32),
        means=jax.ShapeDtypeStruct((b, k), jnp.float32),
        stds=jax.ShapeDtypeStruct((b, k), jnp.float32),
        sanums=jax.ShapeDtypeStruct((b, k), jnp.float32),
        signals=jax.ShapeDtypeStruct((b, s), jnp.float32),
    )


def _tiny_batch(rng, b=4, k=5, s=24):
    return dict(
        kmer=jnp.asarray(rng.integers(0, 4, (b, k)), jnp.int32),
        means=jnp.asarray(rng.normal(0, 1, (b, k)), jnp.float32),
        stds=jnp.asarray(np.abs(rng.normal(0, 1, (b, k))), jnp.float32),
        sanums=jnp.asarray(rng.integers(1, 40, (b, k)), jnp.float32),
        signals=jnp.asarray(rng.normal(0, 1, (b, s)), jnp.float32),
    )


def _shapes(cfg, b=4):
    """Abstract init+apply: returns (variables_shapes, logits_shape)."""
    model = DeepSignalNet(cfg)
    batch = _abstract_batch(b, cfg.kmer_len, cfg.cent_signals_len)
    var_shapes = jax.eval_shape(
        lambda r, bt: model.init(r, **bt, train=False),
        jax.random.PRNGKey(0), batch)
    out_shape = jax.eval_shape(
        lambda v, bt: model.apply(v, **bt, train=False), var_shapes, batch)
    return var_shapes, out_shape


def test_full_size_forward_shapes():
    var_shapes, out = _shapes(ModelConfig())
    assert out.shape == (4, 2)
    assert out.dtype == jnp.float32
    params = var_shapes["params"]
    # embedding table (model.py:19-20)
    assert params["embedding"].shape == (1024, 128)
    # BiLSTM layer-0 kernel: [(131+256), 4*256] fw/bw (layers.py:47-66)
    assert params["event_model"]["fw_0"]["kernel"].shape == (131 + 256, 1024)
    assert params["event_model"]["bw_0"]["kernel"].shape == (131 + 256, 1024)
    # layer-1 input = layer-0 output of the SAME direction (TF MultiRNNCell
    # stacks fw/bw independently; concat only at the output, layers.py:66-72)
    assert params["event_model"]["fw_1"]["kernel"].shape == (256 + 256, 1024)
    # joint fc1: event 512 + signal 23*240=5520 -> 6032 square
    assert params["joint_model"]["fc1"]["kernel"].shape == (6032, 6032)
    assert params["joint_model"]["fc2"]["kernel"].shape == (6032, 2)


def test_inception_flatten_dim():
    # signal branch: 360 ->(s2) 180 ->(s2) 90 ->(s2) 45 ->(s2) 23 spatial,
    # 240 ch -> flatten 5520 (stale comments at reference layers.py:206,251
    # notwithstanding — SURVEY.md §2.1 C6)
    from deepsignal_tpu.models.layers import InceptionNet
    net = InceptionNet(times=16)
    x = jax.ShapeDtypeStruct((2, 360, 1), jnp.float32)
    var_shapes = jax.eval_shape(
        lambda r, xx: net.init(r, xx, train=False), jax.random.PRNGKey(0), x)
    out = jax.eval_shape(lambda v, xx: net.apply(v, xx, train=False),
                         var_shapes, x)
    assert out.shape == (2, 23 * 240)


@pytest.mark.parametrize("is_cnn,is_rnn,is_base",
                         [(True, False, False), (False, True, True),
                          (False, True, False), (True, True, False)])
def test_ablation_modes(is_cnn, is_rnn, is_base):
    cfg = ModelConfig(is_cnn=is_cnn, is_rnn=is_rnn, is_base=is_base, **TINY)
    _, out = _shapes(cfg)
    assert out.shape == (4, 2)


def test_ablation_rejects_no_branch():
    with pytest.raises(ValueError):
        ModelConfig(is_cnn=False, is_rnn=False)


def test_tiny_forward_executes(rng):
    # jit everything: eager op-by-op dispatch compiles hundreds of tiny XLA
    # programs, which is pathologically slow on the 2-core test machine
    cfg = ModelConfig(**TINY)
    model = DeepSignalNet(cfg)
    batch = _tiny_batch(rng)
    variables = jax.jit(lambda r, b: model.init(r, **b, train=False))(
        jax.random.PRNGKey(0), batch)
    logits = jax.jit(lambda v, b: model.apply(v, **b, train=False))(
        variables, batch)
    assert logits.shape == (4, 2)
    assert np.all(np.isfinite(np.asarray(logits)))
    # train-mode apply with keep_prob=1.0 also runs (BN batch-stat path)
    logits_tr, _ = jax.jit(
        lambda v, b: model.apply(v, **b, train=True, keep_prob=1.0,
                                 mutable=["batch_stats"],
                                 rngs={"dropout": jax.random.PRNGKey(1)}))(
        variables, batch)
    assert logits_tr.shape == (4, 2)


def test_lstm_layer_matches_manual_cell(rng):
    # oracle: literal TF LSTMCell math, step by step
    b, t, d, h = 3, 5, 7, 11
    x = jnp.asarray(rng.normal(0, 1, (b, t, d)), jnp.float32)
    kernel = jnp.asarray(rng.normal(0, 0.3, (d + h, 4 * h)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.1, (4 * h,)), jnp.float32)

    def manual(x, reverse):
        hh = np.zeros((b, h), np.float32)
        cc = np.zeros((b, h), np.float32)
        order = range(t - 1, -1, -1) if reverse else range(t)
        outs = np.zeros((b, t, h), np.float32)
        for step in order:
            concat = np.concatenate([np.asarray(x[:, step]), hh], axis=1)
            gates = concat @ np.asarray(kernel) + np.asarray(bias)
            i, j, f, o = np.split(gates, 4, axis=1)

            def sig(v):
                return 1.0 / (1.0 + np.exp(-v))
            cc = sig(f + 1.0) * cc + sig(i) * np.tanh(j)
            hh = sig(o) * np.tanh(cc)
            outs[:, step] = hh
        return outs

    # ops are precision-neutral; pin f32 matmuls as the model does (this
    # backend's default matmul precision is reduced)
    with jax.default_matmul_precision("highest"):
        for reverse in (False, True):
            got = lstm_layer(x, kernel, bias, reverse=reverse)
            np.testing.assert_allclose(np.asarray(got), manual(x, reverse),
                                       rtol=1e-4, atol=1e-4)


def test_weighted_ce_matches_tf_formula(rng):
    # tf.nn.weighted_cross_entropy_with_logits reference formula:
    # (1-z)*l + (1 + (w-1)*z) * log(1 + exp(-l))
    logits = rng.normal(0, 3, (50,))
    targets = rng.integers(0, 2, (50,)).astype(np.float64)
    for w in (1.0, 3.0, 0.5):
        want = (1 - targets) * logits + \
            (1 + (w - 1) * targets) * np.log1p(np.exp(-np.abs(logits))) + \
            (1 + (w - 1) * targets) * np.maximum(-logits, 0)
        got = weighted_ce_with_logits(jnp.asarray(logits, jnp.float32),
                                      jnp.asarray(targets, jnp.float32), w)
        # XLA CPU's exp/log1p differ from libm at ~1e-5; a wrong formula
        # would diverge at O(1)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3,
                                   atol=1e-4)


def test_loss_branch_selection(rng):
    logits = jnp.asarray(rng.normal(0, 1, (8, 2)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 2, (8,)), jnp.int32)
    # pos_weight==1: one-hot grid mean (2B elements)
    l1 = forward_with_loss(logits, labels, 2, 1.0)
    one_hot = jax.nn.one_hot(labels, 2)
    want = np.mean(np.asarray(weighted_ce_with_logits(logits, one_hot, 1.0)))
    np.testing.assert_allclose(float(l1), want, rtol=1e-6)
    # pos_weight!=1: scalar class-1-logit form (B elements)
    l2 = forward_with_loss(logits, labels, 2, 3.0)
    want2 = np.mean(np.asarray(weighted_ce_with_logits(
        logits[:, 1], labels.astype(jnp.float32), 3.0)))
    np.testing.assert_allclose(float(l2), want2, rtol=1e-6)


def test_prediction_rules():
    logits = jnp.asarray([[2.0, -1.0], [-1.0, 2.0], [0.1, 0.2]])
    np.testing.assert_array_equal(predictions(logits, 1.0), [0, 1, 1])
    # pos_weight != 1: threshold on sigmoid(logit1) > 0.5 <=> logit1 > 0
    np.testing.assert_array_equal(predictions(logits, 2.0), [0, 1, 1])
    logits2 = jnp.asarray([[5.0, -0.1]])
    np.testing.assert_array_equal(predictions(logits2, 2.0), [0])


def test_normalized_probs_sum_to_one(rng):
    logits = jnp.asarray(rng.normal(0, 2, (16, 2)), jnp.float32)
    p0, p1 = normalized_probs(logits)
    np.testing.assert_allclose(np.asarray(p0 + p1), 1.0, rtol=1e-6)
    # matches sigmoid normalization (call_modifications.py:185-187)
    s = 1.0 / (1.0 + np.exp(-np.asarray(logits)))
    np.testing.assert_allclose(np.asarray(p0), s[:, 0] / (s[:, 0] + s[:, 1]),
                               rtol=1e-5)


def test_loss_decreases_overfitting_tiny_batch(rng):
    # quick learnability smoke: a few grad steps reduce the loss
    import optax
    cfg = ModelConfig(**TINY)
    model = DeepSignalNet(cfg)
    batch = _tiny_batch(rng, b=8)
    labels = jnp.asarray(rng.integers(0, 2, (8,)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), **batch, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state):
        def loss_fn(p):
            logits, new_vars = model.apply(
                {"params": p, "batch_stats": batch_stats}, **batch,
                train=True, keep_prob=1.0, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1)})
            return forward_with_loss(logits, labels, 2, 1.0), new_vars
        (loss, new_vars), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_vars["batch_stats"], opt_state, loss

    losses = []
    for _ in range(6):
        params, batch_stats, opt_state, loss = step(params, batch_stats,
                                                    opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
