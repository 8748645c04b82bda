"""Does block_until_ready actually block on the axon tunnel?

Times the serial chain two ways: block_until_ready(acc) vs float(acc)
(a real device->host fetch).  If the fetch is much slower, block_until_ready
returns early and every prior timing is dispatch-rate, not compute.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from deepsignal_tpu.core.config import ModelConfig
from deepsignal_tpu.models.deepsignal import DeepSignalNet


def make_batch(seed, b):
    rng = np.random.default_rng(seed)
    return dict(kmer=rng.integers(0, 4, (b, 17)).astype(np.int32),
                means=rng.normal(0, 1, (b, 17)).astype(np.float32),
                stds=np.abs(rng.normal(0, 1, (b, 17))).astype(np.float32),
                sanums=rng.integers(1, 40, (b, 17)).astype(np.float32),
                signals=rng.normal(0, 1, (b, 360)).astype(np.float32))


def main():
    print("kind:", jax.devices()[0].device_kind, flush=True)
    for dtype, prec in (("float32", "highest"), ("bfloat16", "default")):
        cfg = ModelConfig(compute_dtype=dtype, matmul_precision=prec)
        model = DeepSignalNet(cfg)
        dummy = make_batch(0, 512)
        init_fn = jax.jit(lambda r, b: model.init(
            {"params": r}, b["kmer"], b["means"], b["stds"], b["sanums"],
            b["signals"], train=False))
        v = init_fn(jax.random.PRNGKey(0), dummy)
        jax.block_until_ready(v)

        for B in (512, 16384):
            @jax.jit
            def step(v, b, acc):
                means = b["means"] + acc * 1e-12
                logits = model.apply(v, b["kmer"], means, b["stds"],
                                     b["sanums"], b["signals"], train=False)
                return acc + logits.sum()

            N = 10
            devs = [jax.device_put(make_batch(100 + i, B)) for i in range(N)]
            acc0 = jax.device_put(jnp.float32(0.0))
            a = step(v, devs[0], acc0)
            jax.block_until_ready(a)
            _ = float(a)

            # (a) block_until_ready timing
            acc = acc0
            t = time.perf_counter()
            for i in range(N):
                acc = step(v, devs[i], acc)
            jax.block_until_ready(acc)
            t_block = (time.perf_counter() - t) / N * 1e3

            # (b) fetch timing (device->host of the final scalar)
            acc = acc0
            t = time.perf_counter()
            for i in range(N):
                acc = step(v, devs[i], acc)
            val = float(acc)
            t_fetch = (time.perf_counter() - t) / N * 1e3

            # (c) fetch EVERY step (no overlap at all)
            acc = acc0
            t = time.perf_counter()
            for i in range(N):
                acc = step(v, devs[i], acc)
                _ = float(acc)
            t_every = (time.perf_counter() - t) / N * 1e3

            print(f"{dtype:9s} B={B:6d}  block={t_block:7.2f}  "
                  f"fetch_end={t_fetch:7.2f}  fetch_every={t_every:7.2f} "
                  f"ms/batch  (final={val:.3e})", flush=True)
        del model, v


if __name__ == "__main__":
    main()
