"""What does this chip actually sustain on pure matmuls?  Establishes the
practical MFU ceiling for the bench's physics gate and kernel work."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed_matmul(m, k, n, dt, iters=8):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (m, k)), dt)
    w = jnp.asarray(rng.normal(0, 0.05, (k, n)), dt)

    @jax.jit
    def chain(acc, x, w):
        y = (x + (acc * 1e-12).astype(x.dtype)) @ w
        return acc + y.astype(jnp.float32).sum()

    acc = jnp.float32(0.0)
    acc = chain(acc, x, w)
    _ = float(acc)
    t = time.perf_counter()
    for _ in range(iters):
        acc = chain(acc, x, w)
    _ = float(acc)
    ms = (time.perf_counter() - t) / iters * 1e3
    tf = 2 * m * k * n / (ms / 1e3) / 1e12
    print(f"{str(dt.__name__ if hasattr(dt, '__name__') else dt):9s} "
          f"[{m:8d},{k:5d}]x[{k:5d},{n:5d}] {ms:8.2f} ms  {tf:7.1f} TFLOP/s",
          flush=True)


def main():
    print("kind:", jax.devices()[0].device_kind, flush=True)
    bf = jnp.bfloat16
    timed_matmul(8192, 8192, 8192, bf)        # square, big
    timed_matmul(16384, 4096, 4096, bf)
    timed_matmul(1474560, 240, 192, bf)       # inception 1x1 shape
    timed_matmul(1474560, 240, 768, bf)       # same but wide N
    timed_matmul(16384, 6032, 6032, bf)       # joint head
    timed_matmul(8192, 8192, 8192, jnp.float32)


if __name__ == "__main__":
    main()
