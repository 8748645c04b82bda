"""Measure XLA cost_analysis flops/site + serial-chained rates vs batch size.

Physics probe for the bench: if serial ms/batch does not scale ~linearly
with batch size, the timing is latency-bound (or the chain is not actually
serializing); flops/site anchors the MFU computation.
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
    print("platform:", jax.default_backend(),
          "kind:", jax.devices()[0].device_kind, flush=True)
    for dtype, prec in (("float32", "highest"), ("bfloat16", "default")):
        cfg = ModelConfig(compute_dtype=dtype, matmul_precision=prec)
        model = DeepSignalNet(cfg)
        dummy = make_batch(0, 512)
        init_fn = jax.jit(lambda r, b: model.init(
            {"params": r}, b["kmer"], b["means"], b["stds"], b["sanums"],
            b["signals"], train=False))
        v = init_fn(jax.random.PRNGKey(0), dummy)
        jax.block_until_ready(v)

        for B in (512, 4096, 16384):
            @jax.jit
            def step(v, b, acc):
                means = b["means"] + acc * 1e-12
                logits = model.apply(v, b["kmer"], means, b["stds"],
                                     b["sanums"], b["signals"], train=False)
                return acc + logits.sum()

            dummy = make_batch(0, B)
            try:
                lowered = step.lower(v, dummy, jnp.float32(0.0))
                ca = lowered.compile().cost_analysis()
                flops = ca.get("flops", float("nan")) if ca else float("nan")
            except Exception as e:  # cost_analysis can be backend-dependent
                flops = float("nan")
                print("  cost_analysis failed:", e)
            N = 12
            devs = [jax.device_put(make_batch(100 + i, B)) for i in range(N)]
            acc = jax.device_put(jnp.float32(0.0))
            acc = step(v, devs[0], acc)
            jax.block_until_ready(acc)
            t = time.perf_counter()
            for i in range(N):
                acc = step(v, devs[i], acc)
            jax.block_until_ready(acc)
            ms = (time.perf_counter() - t) / N * 1e3
            rate = B / ms * 1e3
            tf = flops / B * rate / 1e12
            print(f"{dtype:9s} B={B:6d} flops/site={flops/B/1e6:8.2f}M "
                  f"serial {ms:8.2f} ms/batch  {rate:9.0f} sites/s  "
                  f"-> {tf:7.1f} TFLOP/s", flush=True)
        del model, v


if __name__ == "__main__":
    main()
