"""Serial-chained timing: call i+1 consumes call i's output, so executions
cannot overlap or be farmed out — measures true per-chip serial latency.

Sync protocol: every timing region ends with ``float(acc)`` — an actual
device->host fetch.  ``block_until_ready`` has been observed to return
before execution finishes on the axon tunnel (see bench.py), which made
pre-round-3 numbers from this script unreliable."""
import time
import jax
import numpy as np
import jax.numpy as jnp
from deepsignal_tpu.core.config import ModelConfig
from deepsignal_tpu.models.deepsignal import DeepSignalNet

B, N = 512, 12

def make_batch(seed):
    rng = np.random.default_rng(seed)
    return dict(kmer=rng.integers(0, 4, (B, 17)).astype(np.int32),
                means=rng.normal(0, 1, (B, 17)).astype(np.float32),
                stds=np.abs(rng.normal(0, 1, (B, 17))).astype(np.float32),
                sanums=rng.integers(1, 40, (B, 17)).astype(np.float32),
                signals=rng.normal(0, 1, (B, 360)).astype(np.float32))

def main():
    print("platform:", jax.default_backend(), flush=True)
    jax.block_until_ready(jax.jit(lambda a: a + 1)(np.ones(8, np.float32)))
    for dtype, prec, impl in (("float32", "highest", "xla"),
                              ("float32", "highest", "pallas"),
                              ("bfloat16", "default", "xla"),
                              ("bfloat16", "default", "pallas")):
        cfg = ModelConfig(compute_dtype=dtype, matmul_precision=prec,
                          lstm_impl=impl)
        model = DeepSignalNet(cfg)
        dummy = make_batch(0)
        init_fn = jax.jit(lambda r, b: model.init(
            {"params": r}, b["kmer"], b["means"], b["stds"], b["sanums"],
            b["signals"], train=False))
        v = init_fn(jax.random.PRNGKey(0), dummy)
        jax.block_until_ready(v)

        @jax.jit
        def step(v, b, acc):
            # chain: perturb one input by the running scalar so each call
            # depends on the previous call's real output
            means = b["means"] + acc * 1e-12
            logits = model.apply(v, b["kmer"], means, b["stds"],
                                 b["sanums"], b["signals"], train=False)
            return acc + logits.sum()

        devs = [jax.device_put(make_batch(100 + i)) for i in range(N)]
        acc = jax.device_put(jnp.float32(0.0))
        acc = step(v, devs[0], acc)
        _ = float(acc)  # fetch-sync (block_until_ready lies on the tunnel)
        t = time.perf_counter()
        for i in range(N):
            acc = step(v, devs[i], acc)
        _ = float(acc)
        ms = (time.perf_counter() - t) / N * 1e3
        print(f"{dtype:9s} {impl:7s} serial-chained: {ms:7.2f} ms/batch "
              f"({B/ms*1e3:8.0f} sites/s)", flush=True)
        del model, v, devs, step

if __name__ == "__main__":
    main()
