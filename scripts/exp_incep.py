"""Inception-block fusion probe: 5 same-input 1x1 convs (cout 48/32/32/48/32)
vs one concatenated cout=192 matmul, and 1x3/1x5 mid convs vs a padded
block-diagonal merge.  Decides the layers.py restructuring."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, n=8):
    out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, (tuple, list)) else out)
              .astype(jnp.float32))
    acc = jnp.float32(0.0)

    @jax.jit
    def chain(acc, *a):
        r = fn(a[0] + (acc * 1e-12).astype(a[0].dtype), *a[1:])
        r0 = r[0] if isinstance(r, (tuple, list)) else r
        return acc + r0.astype(jnp.float32).sum()

    acc = chain(acc, *args)
    _ = float(acc)
    t = time.perf_counter()
    for _i in range(n):
        acc = chain(acc, *args)
    _ = float(acc)
    return (time.perf_counter() - t) / n * 1e3


def main():
    B, S, CIN = 16384, 90, 240
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, S, CIN)), dt)
    couts = (48, 32, 32, 48, 32)
    ws = [jnp.asarray(rng.normal(0, 0.05, (CIN, c)), dt) for c in couts]
    wcat = jnp.concatenate(ws, axis=1)

    @jax.jit
    def separate(x, *ws):
        return [jax.nn.relu(x @ w) for w in ws]

    @jax.jit
    def fused(x, wcat):
        y = jax.nn.relu(x @ wcat)
        outs = []
        o = 0
        for c in couts:
            outs.append(y[..., o:o + c])
            o += c
        return outs

    ms_sep = timed(lambda x: separate(x, *ws), x)
    ms_fus = timed(lambda x: fused(x, wcat), x)
    print(f"1x1 convs  separate: {ms_sep:7.2f} ms   fused: {ms_fus:7.2f} ms "
          f"({ms_sep/ms_fus:.2f}x)", flush=True)

    # mid convs: 1x3 (32->48), 1x5 (32->48), 1x3 (32->64) on different inputs
    xs = [jnp.asarray(rng.normal(0, 1, (B, S, 32)), dt) for _ in range(3)]
    k3a = jnp.asarray(rng.normal(0, 0.05, (3, 32, 48)), dt)
    k5 = jnp.asarray(rng.normal(0, 0.05, (5, 32, 48)), dt)
    k3b = jnp.asarray(rng.normal(0, 0.05, (3, 32, 64)), dt)

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1,), "SAME", dimension_numbers=("NWC", "WIO", "NWC"))

    @jax.jit
    def mid_separate(x0, x1, x2):
        return [conv(x0, k3a), conv(x1, k5), conv(x2, k3b)]

    # block-diagonal merge: concat inputs to 96ch, one 1x5 conv to 160ch
    kbd = jnp.zeros((5, 96, 160), dt)
    kbd = kbd.at[1:4, 0:32, 0:48].set(k3a)
    kbd = kbd.at[:, 32:64, 48:96].set(k5)
    kbd = kbd.at[1:4, 64:96, 96:160].set(k3b)

    @jax.jit
    def mid_fused(x0, x1, x2):
        xcat = jnp.concatenate([x0, x1, x2], axis=-1)
        y = conv(xcat, kbd)
        return [y[..., :48], y[..., 48:96], y[..., 96:160]]

    ms_sep = timed(lambda x0: mid_separate(x0, xs[1], xs[2]), xs[0])
    ms_fus = timed(lambda x0: mid_fused(x0, xs[1], xs[2]), xs[0])
    print(f"mid convs  separate: {ms_sep:7.2f} ms   blockdiag: {ms_fus:7.2f} "
          f"ms ({ms_sep/ms_fus:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
