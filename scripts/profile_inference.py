"""Decompose single-chip inference time: h2d vs compute, dtype, batch size,
LSTM impl, and per-branch cost.  Dev tool, not part of the package."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from deepsignal_tpu.core.config import ModelConfig
from deepsignal_tpu.models.deepsignal import DeepSignalNet, init_model, predictions

ITERS = 20
TRIALS = 3


def make_batch(b, k=17, s=360, seed=0):
    rng = np.random.default_rng(seed)
    return dict(
        kmer=rng.integers(0, 4, (b, k)).astype(np.int32),
        means=rng.normal(0, 1, (b, k)).astype(np.float32),
        stds=np.abs(rng.normal(0, 1, (b, k))).astype(np.float32),
        sanums=rng.integers(1, 40, (b, k)).astype(np.float32),
        signals=rng.normal(0, 1, (b, s)).astype(np.float32))


def bench(fn, *args, iters=ITERS, trials=TRIALS):
    out = fn(*args)
    jax.block_until_ready(out)
    best = []
    for _ in range(trials):
        t = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best.append((time.perf_counter() - t) / iters)
    return min(best) * 1e3  # ms


def full_fn(cfg, model):
    @jax.jit
    def fn(variables, b):
        logits = model.apply(variables, b["kmer"], b["means"], b["stds"],
                             b["sanums"], b["signals"], train=False)
        act = jax.nn.sigmoid(logits)
        return act, predictions(logits, 1.0)
    return fn


def main():
    print("platform:", jax.default_backend())
    for B in (512, 2048, 4096):
        batch_h = make_batch(B)
        for dtype, prec in (("float32", "highest"), ("bfloat16", "default")):
            for impl in ("xla",):
                cfg = ModelConfig(compute_dtype=dtype, matmul_precision=prec,
                                  lstm_impl=impl)
                model, variables = init_model(cfg, batch_size=8)
                variables = jax.device_put(variables)
                fn = full_fn(cfg, model)
                batch_d = jax.device_put(batch_h)
                jax.block_until_ready(batch_d)
                ms_dev = bench(fn, variables, batch_d)
                ms_h2d = bench(fn, variables, batch_h)
                print(f"B={B:5d} {dtype:9s} {impl:6s} "
                      f"device-resident={ms_dev:7.2f}ms  with-h2d={ms_h2d:7.2f}ms  "
                      f"sites/s(dev)={B/ms_dev*1e3:9.0f}")
                del variables, fn, batch_d

    # branch decomposition at B=512 f32
    B = 512
    batch_h = make_batch(B)
    for name, kw in (("rnn-only", dict(is_cnn=False)),
                     ("cnn-only", dict(is_rnn=False))):
        cfg = ModelConfig(matmul_precision="highest", lstm_impl="xla", **kw)
        model, variables = init_model(cfg, batch_size=8)
        variables = jax.device_put(variables)
        fn = full_fn(cfg, model)
        batch_d = jax.device_put(batch_h)
        jax.block_until_ready(batch_d)
        print(f"B={B} f32 {name:9s} device-resident="
              f"{bench(fn, variables, batch_d):7.2f}ms")
        del variables, fn, batch_d


if __name__ == "__main__":
    main()
