"""Flax building blocks for the DeepSignal fusion model.

Behavioral contract follows ``deepsignal/layers.py``:

- ``BiLSTMEncoder``    <-> rnn_layers/Event_model (layers.py:20-72,142-173):
  independent forward/backward 3-layer LSTM stacks, per-layer output dropout
  (DropoutWrapper output_keep_prob), output = concat(fw[:, -1], bw[:, 0]).
- ``InceptionBlock``   <-> inception_layer (layers.py:87-139): five branches
  (maxpool+1x1 / 1x1 / 1x1->1x3 / 1x1->1x5 / residual 1x1-stem + 1x1->1x3->1x1),
  each ``times*3`` channels, concatenated -> 15*times channels.
- ``InceptionNet``     <-> incept_net (layers.py:176-239): stem conv7/s2 ->
  maxpool/s2 -> 1x1(128) -> 1x3(256) -> 3 incept -> maxpool/s2 -> 5 incept ->
  maxpool/s2 -> 3 incept -> avgpool7/s1 -> flatten.
- ``JointHead``        <-> Joint_model (layers.py:242-264): FC(same-dim) ->
  dropout -> FC(class_num) -> dropout (the reference's dropout-after-logits
  quirk is preserved; it is a no-op at inference).

TPU notes: all convs are 1D over the signal axis ([B, L, C] layout) so XLA
lowers them to MXU matmuls; BatchNorm momentum 0.9 / eps 1e-3 matches
tf.contrib batch_norm defaults (layers.py:80-84).  The reference's
``zero_debias_moving_mean`` only changes moving-stat warm-up, not the
converged statistics; it is intentionally not replicated.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.bilstm import lstm_layer


class TFLSTMLayer(nn.Module):
    """One unidirectional LSTM layer-direction with TF1-LSTMCell weight
    layout (kernel [(D+H), 4H], input rows first; bias [4H]).

    setup-based (not compact) so the fused whole-encoder path can pull the
    params via ``params_in`` without running the per-layer scan, while the
    variable tree path stays ``event_model/{fw,bw}_i/*`` for checkpoints and
    the TF1 importer either way."""

    hidden: int
    in_dim: int
    reverse: bool = False

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.glorot_uniform(),
                                 (self.in_dim + self.hidden, 4 * self.hidden))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (4 * self.hidden,))

    def __call__(self, x):
        return lstm_layer(x, self.kernel.astype(x.dtype),
                          self.bias.astype(x.dtype), reverse=self.reverse)

    def params_in(self, dtype):
        return self.kernel.astype(dtype), self.bias.astype(dtype)


class BiLSTMEncoder(nn.Module):
    """Stacked bidirectional LSTM encoder (layers.py:20-72, 142-173).

    ``impl``: "xla" = per-layer lax.scan; "pallas" = the fused whole-encoder
    VMEM-resident kernel (ops/pallas/lstm.py) on the inference path; "auto" =
    pallas on TPU for BOTH dtypes, xla otherwise — measured on real hardware
    under the serial-chained fetch-synced protocol (scripts/exp_lstm.py,
    full model, v5e): f32@16384 385 -> 276 ms/batch (1.40x), bf16@16384
    137.6 -> 112.2 ms (1.23x), and it also wins at batch 512 for both
    dtypes.  (Round-2 timings that showed f32-pallas losing were taken
    before fetch-synced timing and were unreliable.)  Training with dropout
    (keep_prob < 1) always takes the per-layer path — the fused kernel has
    no inter-layer dropout (a no-op at inference anyway); its gradients are
    still exact via the custom VJP (bilstm_encoder_fused)."""

    hidden: int = 256
    num_layers: int = 3
    impl: str = "auto"

    @nn.compact
    def __call__(self, x, *, deterministic: bool, keep_prob: float = 1.0):
        d = x.shape[-1]
        layers_fw = [TFLSTMLayer(self.hidden, d if i == 0 else self.hidden,
                                 reverse=False, name=f"fw_{i}")
                     for i in range(self.num_layers)]
        layers_bw = [TFLSTMLayer(self.hidden, d if i == 0 else self.hidden,
                                 reverse=True, name=f"bw_{i}")
                     for i in range(self.num_layers)]

        dropout_live = not deterministic and keep_prob < 1.0
        use_fused = (not dropout_live and self.num_layers == 3
                     and self.hidden % 128 == 0 and x.shape[0] >= 8
                     and (self.impl == "pallas" or (
                         self.impl == "auto"
                         and jax.default_backend() == "tpu")))
        if use_fused:
            from ..ops.pallas import bilstm_encoder_fused
            kf, bf = zip(*(m.params_in(x.dtype) for m in layers_fw))
            kb, bb = zip(*(m.params_in(x.dtype) for m in layers_bw))
            return bilstm_encoder_fused(x, kf, bf, kb, bb)

        fw, bw = x, x
        for layer in range(self.num_layers):
            fw = layers_fw[layer](fw)
            bw = layers_bw[layer](bw)
            # DropoutWrapper(output_keep_prob) on every stacked cell
            # (layers.py:51-54); new mask per timestep == iid elementwise.
            fw = nn.Dropout(rate=1.0 - keep_prob)(
                fw, deterministic=deterministic)
            bw = nn.Dropout(rate=1.0 - keep_prob)(
                bw, deterministic=deterministic)
        # Event_model extract (layers.py:169-173): last fw step, first bw step
        return jnp.concatenate([fw[:, -1, :], bw[:, 0, :]], axis=1)


class TFBatchNorm(nn.Module):
    """Batch norm with ``tf.contrib.layers.batch_norm`` semantics
    (decay 0.9, eps 1e-3, center+scale; reference layers.py:80-84).

    Differs from ``nn.BatchNorm`` in one load-bearing way: all math runs in
    the INPUT dtype (running stats promoted first), whereas flax computes
    ``rsqrt(var + eps)`` on the float32 stats before promotion — capping BN
    at float32 precision and breaking float64 parity harnesses.  Stats are
    stored float32 (storage contract unchanged); the tree names mirror
    flax's (``BatchNorm_0/{scale,bias}`` + ``batch_stats/.../{mean,var}``)
    so checkpoints and the TF1 importer are unaffected.  The reference's
    ``zero_debias_moving_mean`` only reshapes moving-stat warm-up, not
    converged statistics; intentionally not replicated.
    """

    momentum: float = 0.9
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x, *, use_running_average: bool):
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((features,), jnp.float32))
        if use_running_average:
            mean = ra_mean.value.astype(x.dtype)
            var = ra_var.value.astype(x.dtype)
        else:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=axes)
            # population (biased) variance, like tf.nn.moments
            var = jnp.mean(jnp.square(x - mean.astype(x.dtype)), axis=axes)
            if not self.is_initializing():
                m = jnp.asarray(self.momentum, jnp.float32)
                ra_mean.value = (m * ra_mean.value
                                 + (1.0 - m) * mean.astype(jnp.float32))
                ra_var.value = (m * ra_var.value
                                + (1.0 - m) * var.astype(jnp.float32))
        inv = jax.lax.rsqrt(var + jnp.asarray(self.epsilon, x.dtype))
        y = (x - mean) * (inv * scale.astype(x.dtype))
        return y + bias.astype(x.dtype)


class ConvBNRelu(nn.Module):
    """conv(no bias) -> BN -> relu, the repeated motif of incept_net.

    Computes in the INPUT dtype (``dtype=x.dtype`` casts the f32-stored
    kernel down before the conv): without this, flax's default promotion
    silently upcasts the whole CNN to float32 on the bfloat16 fast path —
    params are stored f32 — wasting both MXU rate and HBM bandwidth.  The
    float32 parity path is unchanged (promotion was f32 already)."""

    features: int
    kernel: int
    stride: int = 1
    use_relu: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = nn.Conv(self.features, kernel_size=(self.kernel,),
                    strides=(self.stride,), padding="SAME", use_bias=False,
                    dtype=x.dtype)(x)
        x = TFBatchNorm(name="BatchNorm_0")(x, use_running_average=not train)
        return nn.relu(x) if self.use_relu else x


def _max_pool_same(x, window: int, stride: int):
    return nn.max_pool(x, window_shape=(window,), strides=(stride,),
                       padding="SAME")


class InceptionBlock(nn.Module):
    """Five-branch inception block (layers.py:87-139); out = 15*times ch."""

    times: int = 16

    @nn.compact
    def __call__(self, x, *, train: bool):
        t = self.times
        # branch1: maxpool 1x3/s1 -> 1x1(3t)
        b1 = _max_pool_same(x, 3, 1)
        b1 = ConvBNRelu(t * 3, 1, name="branch1_conv1a")(b1, train=train)
        # branch2: 1x1(3t)
        b2 = ConvBNRelu(t * 3, 1, name="branch2_conv0b")(x, train=train)
        # branch3: 1x1(2t) -> 1x3(3t)
        b3 = ConvBNRelu(t * 2, 1, name="branch3_conv0c")(x, train=train)
        b3 = ConvBNRelu(t * 3, 3, name="branch3_conv1c")(b3, train=train)
        # branch4: 1x1(2t) -> 1x5(3t)
        b4 = ConvBNRelu(t * 2, 1, name="branch4_conv0d")(x, train=train)
        b4 = ConvBNRelu(t * 3, 5, name="branch4_conv1d")(b4, train=train)
        # branch5: residual — stem 1x1(3t, BN only) + (1x1(2t)->1x3(4t)->1x1(3t, BN only))
        stem = ConvBNRelu(t * 3, 1, use_relu=False,
                          name="branch5_convstem")(x, train=train)
        b5 = ConvBNRelu(t * 2, 1, name="branch5_conv0e")(x, train=train)
        b5 = ConvBNRelu(t * 4, 3, name="branch5_conv1e")(b5, train=train)
        b5 = ConvBNRelu(t * 3, 1, use_relu=False,
                        name="branch5_conv2e")(b5, train=train)
        b5 = nn.relu(stem + b5)
        return jnp.concatenate([b1, b2, b3, b4, b5], axis=-1)


class InceptionNet(nn.Module):
    """Signal-branch CNN (layers.py:176-239).  Input [B, signal_len, 1].

    ``blocks`` = inception blocks per stage; the reference is (3, 5, 3)."""

    times: int = 16
    blocks: tuple = (3, 5, 3)

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = ConvBNRelu(64, 7, stride=2, name="conv_layer1")(x, train=train)
        x = _max_pool_same(x, 3, 2)
        x = ConvBNRelu(128, 1, name="conv_layer2")(x, train=train)
        x = ConvBNRelu(256, 3, name="conv_layer3")(x, train=train)
        idx = 1
        for stage, n_blocks in enumerate(self.blocks):
            if stage > 0:
                x = _max_pool_same(x, 3, 2)
            for _ in range(n_blocks):
                x = InceptionBlock(self.times,
                                   name=f"incp_layer{idx}")(x, train=train)
                idx += 1
        # avg pool 1x7 stride 1 SAME; TF average_pooling2d excludes padding
        # from the denominator -> count_include_pad=False
        x = nn.avg_pool(x, window_shape=(7,), strides=(1,), padding="SAME",
                        count_include_pad=False)
        return x.reshape(x.shape[0], -1)


class JointHead(nn.Module):
    """Joint FC head (layers.py:242-264), incl. dropout-after-logits quirk."""

    class_num: int = 2

    @nn.compact
    def __call__(self, event_out: Optional[jnp.ndarray],
                 signal_out: Optional[jnp.ndarray], *,
                 deterministic: bool, keep_prob: float = 1.0):
        if signal_out is not None and event_out is not None:
            joint = jnp.concatenate([event_out, signal_out], axis=1)
        elif signal_out is not None:
            joint = signal_out
        else:
            joint = event_out
        # dtype=joint.dtype: compute the two big dense layers in the
        # branches' compute dtype (see ConvBNRelu) — f32 path unchanged
        fc1 = nn.Dense(joint.shape[1], use_bias=False, name="fc1",
                       dtype=joint.dtype)(joint)
        drop1 = nn.Dropout(rate=1.0 - keep_prob)(fc1, deterministic=deterministic)
        fc2 = nn.Dense(self.class_num, use_bias=False, name="fc2",
                       dtype=joint.dtype)(drop1)
        return nn.Dropout(rate=1.0 - keep_prob)(fc2, deterministic=deterministic)
