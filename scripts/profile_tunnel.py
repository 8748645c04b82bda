"""Characterize the host->device link: bandwidth (fresh vs repeated
content), per-call latency, and transfer/compute overlap.  Dev tool."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def t_ms(fn, n=4):
    fn()  # warm
    t = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn())
    return (time.perf_counter() - t) / n * 1e3


def main():
    print("platform:", jax.default_backend())

    # per-call latency: trivial jit on device-resident scalar
    x = jax.device_put(jnp.float32(1.0))
    f = jax.jit(lambda v: v + 1)
    print(f"trivial jit roundtrip: {t_ms(lambda: f(x)):.2f} ms")

    # d2h latency for small result
    y = jax.device_put(np.zeros((512, 2), np.float32))
    print(f"d2h 4KB: {t_ms(lambda: np.asarray(y)):.2f} ms")

    # h2d bandwidth, fresh content each call
    for mb in (1, 4):
        n = mb * (1 << 20) // 4
        bufs = [np.random.default_rng(i).random(n, np.float32)
                for i in range(4)]
        i = [0]

        def put():
            i[0] += 1
            return jax.device_put(bufs[i[0] % 4])
        ms = t_ms(put)
        print(f"h2d fresh {mb:2d}MB: {ms:8.2f} ms  ({mb / ms * 1e3:.1f} MB/s)")

        # repeated same array object
        same = bufs[0]
        ms = t_ms(lambda: jax.device_put(same))
        print(f"h2d same  {mb:2d}MB: {ms:8.2f} ms  ({mb / ms * 1e3:.1f} MB/s)")

        # same content, different object
        copies = [bufs[0].copy() for _ in range(4)]

        def put_c():
            i[0] += 1
            return jax.device_put(copies[i[0] % 4])
        ms = t_ms(put_c)
        print(f"h2d copy  {mb:2d}MB: {ms:8.2f} ms  ({mb / ms * 1e3:.1f} MB/s)")

    # int16 vs float32 wire for the same element count
    n = 512 * 360
    a16 = [np.random.default_rng(i).integers(-2000, 2000, n).astype(np.int16)
           for i in range(4)]
    i = [0]

    def put16():
        i[0] += 1
        return jax.device_put(a16[i[0] % 4])
    print(f"h2d fresh int16 [512*360] ({n * 2 >> 10}KB): {t_ms(put16):.2f} ms")

    # overlap: big device matmul while a fresh transfer is in flight
    w = jax.device_put(np.random.default_rng(9).random((4096, 4096),
                                                       np.float32))
    mm = jax.jit(lambda w: (w @ w).sum())
    ms_mm = t_ms(lambda: mm(w))
    print(f"matmul 4096^2: {ms_mm:.2f} ms")
    fresh = [np.random.default_rng(100 + k).random(1 << 20, np.float32)
             for k in range(8)]

    def both():
        i[0] += 1
        d = jax.device_put(fresh[i[0] % 8])
        r = mm(w)
        return d, r
    ms_both = t_ms(both)
    print(f"4MB h2d + matmul together: {ms_both:.2f} ms "
          f"(sum would be {ms_mm + 4 / 1:.0f}+)")


if __name__ == "__main__":
    main()
