"""One-process comprehensive TPU measurement: fused-vs-XLA LSTM, f32/bf16,
device-resident + fresh-h2d rates, and wire experiments.  The tunnel's
first execution costs minutes of warmup, so everything runs in one process;
results print incrementally."""

import time

import jax
import numpy as np

from deepsignal_tpu.core.config import ModelConfig
from deepsignal_tpu.models.deepsignal import DeepSignalNet, predictions

ITERS, TRIALS = 10, 3
B = 512


def make_batch(seed=0, b=B, k=17, s=360):
    rng = np.random.default_rng(seed)
    return dict(kmer=rng.integers(0, 4, (b, k)).astype(np.int32),
                means=rng.normal(0, 1, (b, k)).astype(np.float32),
                stds=np.abs(rng.normal(0, 1, (b, k))).astype(np.float32),
                sanums=rng.integers(1, 40, (b, k)).astype(np.float32),
                signals=rng.normal(0, 1, (b, s)).astype(np.float32))


def bench(fn, *args):
    jax.block_until_ready(fn(*args))
    best = []
    for _ in range(TRIALS):
        t = time.perf_counter()
        outs = [fn(*args) for _ in range(ITERS)]
        jax.block_until_ready(outs)
        best.append((time.perf_counter() - t) / ITERS)
    return min(best) * 1e3


def init_on_device(cfg):
    import jax.numpy as jnp
    model = DeepSignalNet(cfg)
    k, s = cfg.kmer_len, cfg.cent_signals_len
    dummy = dict(kmer=jnp.zeros((8, k), jnp.int32),
                 means=jnp.zeros((8, k), jnp.float32),
                 stds=jnp.zeros((8, k), jnp.float32),
                 sanums=jnp.zeros((8, k), jnp.float32),
                 signals=jnp.zeros((8, s), jnp.float32))
    init_fn = jax.jit(lambda r, b: model.init(
        {"params": r}, b["kmer"], b["means"], b["stds"], b["sanums"],
        b["signals"], train=False))
    v = init_fn(jax.random.PRNGKey(0), dummy)
    jax.block_until_ready(v)
    return model, v


def main():
    print("platform:", jax.default_backend(), flush=True)
    t0 = time.time()
    # warmup: tiny program absorbs the per-process first-execution cost
    jax.block_until_ready(jax.jit(lambda a: a + 1)(np.ones(8, np.float32)))
    print(f"warmup done in {time.time() - t0:.0f}s", flush=True)

    # latency + raw wire probes
    x = jax.device_put(np.ones((256, 256), np.float32))
    f = jax.jit(lambda a: (a @ a).sum())
    print(f"trivial call latency: {bench(f, x):.2f} ms", flush=True)

    batches = [make_batch(i) for i in range(4)]
    i = [0]

    def put5():
        i[0] += 1
        b = batches[i[0] % 4]
        return jax.device_put((b["kmer"], b["means"], b["stds"],
                               b["sanums"], b["signals"]))
    print(f"h2d fresh 5-array batch (875KB): {bench(put5):.1f} ms", flush=True)

    packed = [np.concatenate([b["kmer"].astype(np.float32), b["means"],
                              b["stds"], b["sanums"], b["signals"]], axis=1)
              for b in batches]

    def put1():
        i[0] += 1
        return jax.device_put(packed[i[0] % 4])
    print(f"h2d fresh packed batch  (899KB): {bench(put1):.1f} ms", flush=True)

    # model configs
    for dtype, prec, impl in (("float32", "highest", "xla"),
                              ("float32", "highest", "pallas"),
                              ("bfloat16", "default", "xla"),
                              ("bfloat16", "default", "pallas")):
        t1 = time.time()
        cfg = ModelConfig(compute_dtype=dtype, matmul_precision=prec,
                          lstm_impl=impl)
        model, variables = init_on_device(cfg)

        @jax.jit
        def fn(v, b):
            logits = model.apply(v, b["kmer"], b["means"], b["stds"],
                                 b["sanums"], b["signals"], train=False)
            return jax.nn.sigmoid(logits), predictions(logits, 1.0)

        dev = jax.device_put(batches[0])
        jax.block_until_ready(dev)
        ms = bench(fn, variables, dev)
        print(f"{dtype:9s} {impl:7s} full model device-resident: {ms:7.2f} ms"
              f"  ({B / ms * 1e3:7.0f} sites/s)  [setup {time.time()-t1:.0f}s]",
              flush=True)

        # rnn-only split
        cfg2 = ModelConfig(compute_dtype=dtype, matmul_precision=prec,
                           lstm_impl=impl, is_cnn=False)
        model2, v2 = init_on_device(cfg2)

        @jax.jit
        def fn2(v, b):
            logits = model2.apply(v, b["kmer"], b["means"], b["stds"],
                                  b["sanums"], b["signals"], train=False)
            return jax.nn.sigmoid(logits), predictions(logits, 1.0)

        ms2 = bench(fn2, v2, dev)
        print(f"{dtype:9s} {impl:7s} rnn-only  device-resident: {ms2:7.2f} ms",
              flush=True)
        del model, variables, model2, v2, fn, fn2, dev

    # fresh-h2d pipelined model path, f32 xla
    cfg = ModelConfig()
    model, variables = init_on_device(cfg)

    @jax.jit
    def fn(v, b):
        logits = model.apply(v, b["kmer"], b["means"], b["stds"],
                             b["sanums"], b["signals"], train=False)
        return jax.nn.sigmoid(logits), predictions(logits, 1.0)

    jax.block_until_ready(fn(variables, jax.device_put(batches[0])))
    for depth in (1, 2):
        best = []
        for _ in range(TRIALS):
            t = time.perf_counter()
            outs = []
            devs = [jax.device_put(batches[k % 4]) for k in range(depth)]
            for k in range(ITERS):
                devs.append(jax.device_put(batches[(k + depth) % 4]))
                outs.append(fn(variables, devs.pop(0)))
            jax.block_until_ready(outs)
            best.append((time.perf_counter() - t) / ITERS)
        ms = min(best) * 1e3
        print(f"f32 fresh-h2d pipelined depth={depth}: {ms:7.2f} ms/batch "
              f"({B / ms * 1e3:7.0f} sites/s)", flush=True)
    print(f"total {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
