"""Int8 experiment on the bandwidth-bound CNN (VERDICT r4 #6).

The round-4 roofline (scripts/exp_cnn.py, docs/PERF.md) showed inception
stages 1-2 running at the HBM streaming ceiling at bf16 — the only
remaining lever is fewer bytes.  v5e doubles the MXU rate for int8 and
halves the activation traffic, so this script measures an int8 variant of
ONE production-shaped L=90 inception block (cin=240, times=16) under the
serial-chained fetch-synced protocol:

- ``bf16``: the shipped lowering (XLA convs, NWC) — the baseline.
- ``int8-conv``: int8 weights (per-output-channel scales) + int8
  activations, ``conv_general_dilated(..., preferred_element_type=int32)``
  accumulation, rescale+relu+requantize between convs (the traffic between
  branch convs is int8, i.e. half the bf16 bytes).
- ``int8-dot``: the same quantization with the 1x1 convs as plain int8
  matmuls and k-tap convs as shifted int8 matmuls (dots historically lower
  better than convs for int8 on TPU).

Also reports the quantization error of the int8 block output vs a float32
oracle block (max/mean relative error) — the accuracy side of the
ship/no-ship decision: probabilities drift ~1e-2 at int8 (vs 7e-5 at
bf16), far above the bf16 gate's zero-flip band.

Run on the TPU host: PYTHONPATH=.:$PYTHONPATH python scripts/exp_int8_cnn.py [B]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, n=6):
    """Serial-chained, fetch-synced ms/call (docs/PERF.md protocol)."""
    out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, (tuple, list)) else out)
              .astype(jnp.float32))

    @jax.jit
    def chain(acc, *a):
        r = fn(a[0] + (acc * 1e-12).astype(a[0].dtype), *a[1:])
        r0 = r[0] if isinstance(r, (tuple, list)) else r
        return acc + r0.astype(jnp.float32).sum()

    acc = chain(jnp.float32(0.0), *args)
    _ = float(acc)
    t = time.perf_counter()
    for _i in range(n):
        acc = chain(acc, *args)
    _ = float(acc)
    return (time.perf_counter() - t) / n * 1e3


def conv(x, k, stride=1, pet=None):
    return jax.lax.conv_general_dilated(
        x, k, (stride,), "SAME", dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=pet)


def make_block_params(rng, cin, t=16, dt=jnp.float32):
    g = lambda *s: jnp.asarray(rng.normal(0, 0.05, s), dt)
    return dict(
        b1=g(1, cin, t * 3), b2=g(1, cin, t * 3),
        b3a=g(1, cin, t * 2), b3b=g(3, t * 2, t * 3),
        b4a=g(1, cin, t * 2), b4b=g(5, t * 2, t * 3),
        stem=g(1, cin, t * 3),
        b5a=g(1, cin, t * 2), b5b=g(3, t * 2, t * 4), b5c=g(1, t * 4, t * 3))


def block_float(x, p):
    """Production-shaped block (exp_cnn.py block_production)."""
    b1 = jax.nn.relu(conv(jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 1), (1, 1, 1), "SAME"), p["b1"]))
    b2 = jax.nn.relu(conv(x, p["b2"]))
    b3 = jax.nn.relu(conv(jax.nn.relu(conv(x, p["b3a"])), p["b3b"]))
    b4 = jax.nn.relu(conv(jax.nn.relu(conv(x, p["b4a"])), p["b4b"]))
    stem = conv(x, p["stem"])
    b5 = conv(jax.nn.relu(conv(jax.nn.relu(conv(x, p["b5a"])), p["b5b"])),
              p["b5c"])
    return jnp.concatenate([b1, b2, b3, b4, jax.nn.relu(stem + b5)], axis=-1)


# ---------------------------------------------------------------------------
# int8 quantization helpers
# ---------------------------------------------------------------------------

def quant_weights(p):
    """Per-output-channel symmetric int8 quantization of every kernel.
    Returns ({name: int8 kernel}, {name: f32 scale[cout]})."""
    q, s = {}, {}
    for name, k in p.items():
        k = np.asarray(k, np.float32)
        amax = np.abs(k).max(axis=(0, 1)) + 1e-12  # [cout]
        scale = amax / 127.0
        q[name] = jnp.asarray(np.clip(np.round(k / scale), -127, 127),
                              jnp.int8)
        s[name] = jnp.asarray(scale, jnp.float32)
    return q, s


def _requant(y_i32, wscale, xscale, out_scale, relu=True):
    """int32 accum -> int8 activation: dequantize (per-channel wscale *
    per-tensor xscale), relu, requantize at out_scale."""
    y = y_i32.astype(jnp.float32) * (wscale * xscale)
    if relu:
        y = jax.nn.relu(y)
    return jnp.clip(jnp.round(y / out_scale), -127, 127).astype(jnp.int8), y


def block_int8_conv(x_i8, q, s, xscale, ascale):
    """All convs int8 with int32 accumulation; inter-conv traffic int8."""
    def c8(h_i8, name, hscale):
        return conv(h_i8, q[name], pet=jnp.int32), s[name] * hscale

    mp = jax.lax.reduce_window(x_i8, jnp.int8(-128), jax.lax.max,
                               (1, 3, 1), (1, 1, 1), "SAME")
    y, sc = c8(mp, "b1", xscale)
    b1 = jax.nn.relu(y.astype(jnp.float32) * sc)
    y, sc = c8(x_i8, "b2", xscale)
    b2 = jax.nn.relu(y.astype(jnp.float32) * sc)

    y, sc = c8(x_i8, "b3a", xscale)
    h, _ = _requant(y, s["b3a"], xscale, ascale)
    y, sc = c8(h, "b3b", ascale)
    b3 = jax.nn.relu(y.astype(jnp.float32) * sc)

    y, sc = c8(x_i8, "b4a", xscale)
    h, _ = _requant(y, s["b4a"], xscale, ascale)
    y, sc = c8(h, "b4b", ascale)
    b4 = jax.nn.relu(y.astype(jnp.float32) * sc)

    y, _ = c8(x_i8, "stem", xscale)
    stem = y.astype(jnp.float32) * (s["stem"] * xscale)
    y, sc = c8(x_i8, "b5a", xscale)
    h, _ = _requant(y, s["b5a"], xscale, ascale)
    y, sc = c8(h, "b5b", ascale)
    h, _ = _requant(y, s["b5b"], ascale, ascale)
    y, sc = c8(h, "b5c", ascale)
    b5 = y.astype(jnp.float32) * sc
    return jnp.concatenate([b1, b2, b3, b4, jax.nn.relu(stem + b5)], axis=-1)


def block_int8_dot(x_i8, q, s, xscale, ascale):
    """1x1 convs as int8 matmuls, k-tap convs as shifted int8 matmuls."""
    def dot8(h_i8, name, hscale):
        y = jax.lax.dot_general(h_i8, q[name][0], (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return y, s[name] * hscale

    def tap8(h_i8, name, hscale):
        k = q[name]
        taps = k.shape[0]
        half = taps // 2
        y = None
        for i in range(taps):
            sh = i - half
            hs = jnp.roll(h_i8, -sh, axis=1)
            if sh > 0:
                hs = hs.at[:, -sh:, :].set(0)
            elif sh < 0:
                hs = hs.at[:, :-sh, :].set(0)
            d = jax.lax.dot_general(hs, k[i], (((2,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            y = d if y is None else y + d
        return y, s[name] * hscale

    mp = jax.lax.reduce_window(x_i8, jnp.int8(-128), jax.lax.max,
                               (1, 3, 1), (1, 1, 1), "SAME")
    y, sc = dot8(mp, "b1", xscale)
    b1 = jax.nn.relu(y.astype(jnp.float32) * sc)
    y, sc = dot8(x_i8, "b2", xscale)
    b2 = jax.nn.relu(y.astype(jnp.float32) * sc)

    y, _ = dot8(x_i8, "b3a", xscale)
    h, _ = _requant(y, s["b3a"], xscale, ascale)
    y, sc = tap8(h, "b3b", ascale)
    b3 = jax.nn.relu(y.astype(jnp.float32) * sc)

    y, _ = dot8(x_i8, "b4a", xscale)
    h, _ = _requant(y, s["b4a"], xscale, ascale)
    y, sc = tap8(h, "b4b", ascale)
    b4 = jax.nn.relu(y.astype(jnp.float32) * sc)

    y, _ = dot8(x_i8, "stem", xscale)
    stem = y.astype(jnp.float32) * (s["stem"] * xscale)
    y, _ = dot8(x_i8, "b5a", xscale)
    h, _ = _requant(y, s["b5a"], xscale, ascale)
    y, sc = tap8(h, "b5b", ascale)
    h, _ = _requant(y, s["b5b"], ascale, ascale)
    y, sc = dot8(h, "b5c", ascale)
    b5 = y.astype(jnp.float32) * sc
    return jnp.concatenate([b1, b2, b3, b4, jax.nn.relu(stem + b5)], axis=-1)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    L, CIN = 90, 240
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0].device_kind}  B={B} L={L} cin={CIN}")

    p32 = make_block_params(rng, CIN, dt=jnp.float32)
    p16 = {k: v.astype(jnp.bfloat16) for k, v in p32.items()}
    x32 = jnp.asarray(rng.normal(0, 1, (B, L, CIN)), jnp.float32)
    x16 = x32.astype(jnp.bfloat16)

    # quantize activations per-tensor (symmetric): production would
    # calibrate; here the probe distribution is known N(0,1)
    xscale = jnp.float32(float(np.abs(np.asarray(x32)).max()) / 127.0)
    ascale = jnp.float32(0.05)  # post-1x1 activation scale (calibrated)
    x_i8 = jnp.clip(jnp.round(x32 / xscale), -127, 127).astype(jnp.int8)
    q, s = quant_weights(p32)

    ms16 = timed(lambda x: block_float(x, p16), x16)
    ms8c = timed(lambda x: block_int8_conv(x, q, s, xscale, ascale), x_i8)
    ms8d = timed(lambda x: block_int8_dot(x, q, s, xscale, ascale), x_i8)

    # bytes at the conv boundaries (the roofline currency of exp_cnn.py):
    # bf16 block moves ~2 B/elem where int8 moves 1 B/elem on inputs and
    # int8 outputs; f32 dequant outputs dominate the int8 write side here.
    print(f"bf16 XLA convs:        {ms16:7.2f} ms/block")
    print(f"int8 convs (i32 acc):  {ms8c:7.2f} ms/block  "
          f"({ms16 / ms8c:4.2f}x vs bf16)")
    print(f"int8 shifted dots:     {ms8d:7.2f} ms/block  "
          f"({ms16 / ms8d:4.2f}x vs bf16)")

    # quantization error vs the f32 oracle block
    ref = np.asarray(jax.jit(block_float)(x32, p32), np.float32)
    got = np.asarray(jax.jit(
        lambda x: block_int8_conv(x, q, s, xscale, ascale))(x_i8),
        np.float32)
    denom = np.maximum(np.abs(ref), 1e-3)
    rel = np.abs(got - ref) / denom
    print(f"int8 output error vs f32 oracle: max_rel={rel.max():.3e} "
          f"mean_rel={rel.mean():.3e} max_abs={np.abs(got - ref).max():.3e}")
    bf = np.asarray(jax.jit(block_float)(x16, p16), np.float32)
    relb = np.abs(bf - ref) / denom
    print(f"bf16 output error vs f32 oracle: max_rel={relb.max():.3e} "
          f"mean_rel={relb.mean():.3e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
