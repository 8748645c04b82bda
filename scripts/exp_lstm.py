"""LSTM impl decision matrix: xla scan vs fused Pallas vs split Pallas,
f32 + bf16, serial-chained + fetch-synced (the only trusted protocol on the
tunnel — see bench.py).  Informs models/layers.py lstm_impl="auto"."""
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
    N = 6
    for dtype, prec in (("float32", "highest"), ("bfloat16", "default")):
        for impl in ("xla", "pallas"):
            cfg = ModelConfig(compute_dtype=dtype, matmul_precision=prec,
                              lstm_impl=impl)
            model = DeepSignalNet(cfg)
            dummy = make_batch(0, 512)
            init_fn = jax.jit(lambda r, b: model.init(
                {"params": r}, b["kmer"], b["means"], b["stds"],
                b["sanums"], b["signals"], train=False))
            v = init_fn(jax.random.PRNGKey(0), dummy)
            jax.block_until_ready(v)
            for B in (512, 16384):
                @jax.jit
                def step(v, b, acc):
                    means = b["means"] + acc * 1e-12
                    logits = model.apply(v, b["kmer"], means, b["stds"],
                                         b["sanums"], b["signals"],
                                         train=False)
                    return acc + logits.sum()

                devs = [jax.device_put(make_batch(100 + i, B))
                        for i in range(N)]
                acc = jax.device_put(jnp.float32(0.0))
                acc = step(v, devs[0], acc)
                _ = float(acc)
                t = time.perf_counter()
                for i in range(N):
                    acc = step(v, devs[i], acc)
                fin = float(acc)
                ms = (time.perf_counter() - t) / N * 1e3
                print(f"{dtype:9s} {impl:13s} B={B:6d} {ms:8.2f} ms/batch "
                      f"({B/ms*1e3:9.0f} sites/s) final={fin:.3e}",
                      flush=True)
            del model, v


if __name__ == "__main__":
    main()
