"""Pallas fused LSTM kernel vs the XLA scan (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from deepsignal_tpu.ops.bilstm import lstm_layer
from deepsignal_tpu.ops.pallas.lstm import lstm_layer_pallas


def _case(rng, b, t, d, h):
    x = jnp.asarray(rng.normal(0, 1, (b, t, d)), jnp.float32)
    kernel = jnp.asarray(rng.normal(0, 0.05, (d + h, 4 * h)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.05, (4 * h,)), jnp.float32)
    return x, kernel, bias


def test_pallas_lstm_matches_xla_scan(rng):
    x, kernel, bias = _case(rng, 16, 17, 131, 256)
    with jax.default_matmul_precision("highest"):
        for reverse in (False, True):
            want = lstm_layer(x, kernel, bias, reverse=reverse)
            got = lstm_layer_pallas(x, kernel, bias, reverse=reverse,
                                    block_b=8, interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-5, atol=1e-5)


def test_pallas_lstm_batch_padding(rng):
    # batch 12 with block 8 -> internal pad to 16, result trimmed
    x, kernel, bias = _case(rng, 12, 5, 7, 128)
    with jax.default_matmul_precision("highest"):
        want = lstm_layer(x, kernel, bias)
        got = lstm_layer_pallas(x, kernel, bias, block_b=8, interpret=True)
    assert got.shape == (12, 5, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_model_pallas_impl_flag(rng):
    # lstm_impl="xla" and the default "auto" (resolves to xla on CPU) agree
    from deepsignal_tpu.core.config import ModelConfig
    from deepsignal_tpu.models.deepsignal import DeepSignalNet
    tiny = dict(lstm_hidden=8, lstm_layers=1, inception_times=1,
                inception_blocks=(1, 1, 1), cent_signals_len=24, kmer_len=5)
    batch = dict(
        kmer=jnp.asarray(rng.integers(0, 4, (8, 5)), jnp.int32),
        means=jnp.asarray(rng.normal(0, 1, (8, 5)), jnp.float32),
        stds=jnp.asarray(np.abs(rng.normal(0, 1, (8, 5))), jnp.float32),
        sanums=jnp.asarray(rng.integers(1, 40, (8, 5)), jnp.float32),
        signals=jnp.asarray(rng.normal(0, 1, (8, 24)), jnp.float32))
    m1 = DeepSignalNet(ModelConfig(lstm_impl="xla", **tiny))
    m2 = DeepSignalNet(ModelConfig(lstm_impl="auto", **tiny))
    v = jax.jit(lambda r, b: m1.init(r, **b, train=False))(
        jax.random.PRNGKey(0), batch)
    o1 = jax.jit(lambda v, b: m1.apply(v, **b, train=False))(v, batch)
    o2 = jax.jit(lambda v, b: m2.apply(v, **b, train=False))(v, batch)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)
