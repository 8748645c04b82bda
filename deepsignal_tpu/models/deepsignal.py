"""The DeepSignal fusion model and its objective.

Contract follows ``deepsignal/model.py``:

- inputs: kmer codes [B,K] int, means/stds/sanums [B,K] float,
  signals [B,S] float (model.py:30-37)
- embedding table [vocab=1024, emb=128], truncated-normal(sqrt(2/vocab))
  (model.py:19-20,61-62); fusion vector = concat(embed, means, stds, sanums)
  -> [B,K,131] (model.py:64-69)
- event branch = BiLSTM encoder -> [B, 2*hidden]; signal branch =
  InceptionNet on [B,S,1]; joint head -> logits [B, class_num]
- activation = sigmoid, NOT softmax (model.py:99-100)
- loss = weighted cross-entropy with logits (model.py:105-118): one-hot
  2-logit form when pos_weight == 1, scalar class-1-logit form otherwise
- prediction = argmax(sigmoid) when pos_weight == 1, else p1 > 0.5
  (model.py:108-116)
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.config import ModelConfig
from .layers import BiLSTMEncoder, InceptionNet, JointHead


class DeepSignalNet(nn.Module):
    """BiLSTM-over-kmer + Inception-CNN-over-signal fusion network."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, kmer, means, stds, sanums, signals, *,
                 train: bool = False, keep_prob: float = 1.0):
        with jax.default_matmul_precision(self.cfg.matmul_precision):
            return self._forward(kmer, means, stds, sanums, signals,
                                 train=train, keep_prob=keep_prob)

    def _forward(self, kmer, means, stds, sanums, signals, *,
                 train: bool, keep_prob: float):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        means = means.astype(dtype)
        stds = stds.astype(dtype)
        sanums = sanums.astype(dtype)
        signals = signals.astype(dtype)

        event_out = None
        if cfg.is_rnn:
            if cfg.is_base:
                emb_table = self.param(
                    "embedding",
                    nn.initializers.truncated_normal(
                        stddev=(2.0 / cfg.vocab_size) ** 0.5),
                    (cfg.vocab_size, cfg.embedding_size))
                embedded = emb_table.astype(dtype)[kmer]  # [B,K,emb]
                fusion = jnp.concatenate(
                    [embedded, means[..., None], stds[..., None],
                     sanums[..., None]], axis=2)
            else:
                fusion = jnp.stack([means, stds, sanums], axis=2)
            event_out = BiLSTMEncoder(cfg.lstm_hidden, cfg.lstm_layers,
                                      impl=cfg.lstm_impl,
                                      name="event_model")(
                fusion, deterministic=not train, keep_prob=keep_prob)

        signal_out = None
        if cfg.is_cnn:
            signal_out = InceptionNet(cfg.inception_times,
                                      tuple(cfg.inception_blocks),
                                      name="signal_model")(
                signals[..., None], train=train)

        logits = JointHead(cfg.class_num, name="joint_model")(
            event_out, signal_out, deterministic=not train,
            keep_prob=keep_prob)
        return logits.astype(jnp.float32)


def weighted_ce_with_logits(logits: jax.Array, targets: jax.Array,
                            pos_weight: float) -> jax.Array:
    """tf.nn.weighted_cross_entropy_with_logits, numerically stable form:

    loss = (1 - z) * l + (1 + (w - 1) * z) * (log1p(exp(-|l|)) + max(-l, 0))
    """
    l, z = logits, targets
    log_weight = 1.0 + (pos_weight - 1.0) * z
    return ((1.0 - z) * l
            + log_weight * (jnp.log1p(jnp.exp(-jnp.abs(l)))
                            + jnp.maximum(-l, 0.0)))


def predictions(logits: jax.Array, pos_weight: float = 1.0) -> jax.Array:
    """Reference prediction rule (model.py:108-116)."""
    if pos_weight == 1.0:
        return jnp.argmax(jax.nn.sigmoid(logits), axis=1)
    prob1 = jax.nn.sigmoid(logits[:, 1])
    return (prob1 > 0.5).astype(jnp.int32)


def forward_with_loss(logits: jax.Array, labels: jax.Array,
                      class_num: int, pos_weight: float = 1.0) -> jax.Array:
    """Mean weighted-CE cost (model.py:105-118): one-hot form for
    pos_weight == 1, class-1-logit form otherwise."""
    if pos_weight == 1.0:
        one_hot = jax.nn.one_hot(labels, class_num, dtype=logits.dtype)
        return jnp.mean(weighted_ce_with_logits(logits, one_hot, pos_weight))
    return jnp.mean(weighted_ce_with_logits(
        logits[:, 1], labels.astype(logits.dtype), pos_weight))


def normalized_probs(logits: jax.Array):
    """(prob_0, prob_1) with prob_i = sigmoid_i / (sigmoid_0 + sigmoid_1)
    (call_modifications.py:185-187); float64 on host side is applied by the
    caller when formatting."""
    act = jax.nn.sigmoid(logits)
    total = act[:, 0] + act[:, 1]
    return act[:, 0] / total, act[:, 1] / total


def init_model(cfg: ModelConfig, rng: Optional[jax.Array] = None,
               batch_size: int = 2):
    """Initialize (params, batch_stats) variables for the model."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    model = DeepSignalNet(cfg)
    k = cfg.kmer_len
    s = cfg.cent_signals_len
    dummy = dict(
        kmer=jnp.zeros((batch_size, k), jnp.int32),
        means=jnp.zeros((batch_size, k), jnp.float32),
        stds=jnp.zeros((batch_size, k), jnp.float32),
        sanums=jnp.zeros((batch_size, k), jnp.float32),
        signals=jnp.zeros((batch_size, s), jnp.float32),
    )
    # jit the whole init: eager init dispatches hundreds of tiny XLA
    # programs, which is pathologically slow on compile-bound hosts
    init_fn = jax.jit(lambda r, b: model.init(
        {"params": r}, b["kmer"], b["means"], b["stds"], b["sanums"],
        b["signals"], train=False))
    variables = jax.device_get(init_fn(rng, dummy))
    return model, variables
