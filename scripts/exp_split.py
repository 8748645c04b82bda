"""Component time split at the production batch: full model vs is_cnn=False
(LSTM+head) vs is_rnn=False (CNN+head), bf16 and f32, serial+fetch-synced.
Guides kernel-optimization priorities (which branch owns the 110 ms)."""
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
    B, N = 16384, 6
    for dtype, prec in (("bfloat16", "default"), ("float32", "highest")):
        for tag, kw in (("full", {}),
                        ("lstm+head", {"is_cnn": False}),
                        ("cnn+head", {"is_rnn": False})):
            cfg = ModelConfig(compute_dtype=dtype, matmul_precision=prec,
                              **kw)
            model = DeepSignalNet(cfg)
            dummy = make_batch(0, B)
            init_fn = jax.jit(lambda r, b: model.init(
                {"params": r}, b["kmer"], b["means"], b["stds"],
                b["sanums"], b["signals"], train=False))
            v = init_fn(jax.random.PRNGKey(0), dummy)
            jax.block_until_ready(v)

            @jax.jit
            def step(v, b, acc):
                means = b["means"] + acc * 1e-12
                logits = model.apply(v, b["kmer"], means, b["stds"],
                                     b["sanums"], b["signals"], train=False)
                return acc + logits.sum()

            devs = [jax.device_put(make_batch(100 + i, B)) for i in range(N)]
            acc = jax.device_put(jnp.float32(0.0))
            acc = step(v, devs[0], acc)
            _ = float(acc)
            t = time.perf_counter()
            for i in range(N):
                acc = step(v, devs[i], acc)
            _ = float(acc)
            ms = (time.perf_counter() - t) / N * 1e3
            print(f"{dtype:9s} {tag:10s} {ms:8.2f} ms/batch", flush=True)
            del model, v, devs


if __name__ == "__main__":
    main()
