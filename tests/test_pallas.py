"""Pallas fused LSTM kernel vs the XLA scan (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def test_fused_encoder_matches_xla(rng):
    from deepsignal_tpu.ops.bilstm import bilstm_encoder_xla
    from deepsignal_tpu.ops.pallas.lstm import bilstm_encoder_pallas
    b, t, d, h = 16, 17, 131, 256
    x = jnp.asarray(rng.normal(0, 1, (b, t, d)), jnp.float32)

    def mk(layer):
        d_in = d if layer == 0 else h
        return jnp.asarray(rng.normal(0, 0.05, (d_in + h, 4 * h)), jnp.float32)

    kf = tuple(mk(i) for i in range(3))
    kb = tuple(mk(i) for i in range(3))
    bf = tuple(jnp.asarray(rng.normal(0, 0.05, (4 * h,)), jnp.float32)
               for _ in range(3))
    bb = tuple(jnp.asarray(rng.normal(0, 0.05, (4 * h,)), jnp.float32)
               for _ in range(3))
    with jax.default_matmul_precision("highest"):
        want = bilstm_encoder_xla(x, kf, bf, kb, bb)
        got = bilstm_encoder_pallas(x, kf, bf, kb, bb, block_b=8,
                                    interpret=True)
    assert got.shape == (b, 2 * h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_encoder_vjp_matches_xla(rng):
    # the custom VJP recomputes through the lax.scan encoder, so gradients
    # must match the XLA encoder's gradients to float32 tolerance
    from deepsignal_tpu.ops.bilstm import bilstm_encoder_xla
    from deepsignal_tpu.ops.pallas.lstm import bilstm_encoder_fused
    b, t, d, h = 8, 9, 7, 128
    x = jnp.asarray(rng.normal(0, 1, (b, t, d)), jnp.float32)

    def mk(layer):
        d_in = d if layer == 0 else h
        return jnp.asarray(rng.normal(0, 0.05, (d_in + h, 4 * h)), jnp.float32)

    kf = tuple(mk(i) for i in range(3))
    kb = tuple(mk(i) for i in range(3))
    bf = tuple(jnp.asarray(rng.normal(0, 0.05, (4 * h,)), jnp.float32)
               for _ in range(3))
    bb = tuple(jnp.asarray(rng.normal(0, 0.05, (4 * h,)), jnp.float32)
               for _ in range(3))
    with jax.default_matmul_precision("highest"):
        g1 = jax.grad(lambda *a: (bilstm_encoder_fused(*a) ** 2).sum(),
                      argnums=(0, 1, 2, 3, 4))(x, kf, bf, kb, bb)
        g2 = jax.grad(lambda *a: (bilstm_encoder_xla(*a) ** 2).sum(),
                      argnums=(0, 1, 2, 3, 4))(x, kf, bf, kb, bb)
    for a, b_ in zip(jax.tree_util.tree_leaves(g1),
                     jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-5, atol=2e-5)


def test_model_fused_pallas_impl_matches_xla(rng):
    # full-size encoder dims inside the real model: impl="pallas" (fused
    # kernel, interpret on CPU) must match impl="xla" end-to-end
    from deepsignal_tpu.core.config import ModelConfig
    from deepsignal_tpu.models.deepsignal import DeepSignalNet
    dims = dict(inception_times=1, inception_blocks=(1, 1, 1),
                cent_signals_len=24, kmer_len=5)
    batch = dict(
        kmer=jnp.asarray(rng.integers(0, 4, (8, 5)), jnp.int32),
        means=jnp.asarray(rng.normal(0, 1, (8, 5)), jnp.float32),
        stds=jnp.asarray(np.abs(rng.normal(0, 1, (8, 5))), jnp.float32),
        sanums=jnp.asarray(rng.integers(1, 40, (8, 5)), jnp.float32),
        signals=jnp.asarray(rng.normal(0, 1, (8, 24)), jnp.float32))
    m1 = DeepSignalNet(ModelConfig(lstm_impl="xla", **dims))
    m2 = DeepSignalNet(ModelConfig(lstm_impl="pallas", **dims))
    v = jax.jit(lambda r, b: m1.init(r, **b, train=False))(
        jax.random.PRNGKey(0), batch)
    o1 = jax.jit(lambda v, b: m1.apply(v, **b, train=False))(v, batch)
    o2 = jax.jit(lambda v, b: m2.apply(v, **b, train=False))(v, batch)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=1e-5, atol=1e-5)
