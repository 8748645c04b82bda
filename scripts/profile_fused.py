"""Fused pallas encoder vs XLA scan on the real chip (device-resident, B=512)."""
import sys
import time
import jax
import numpy as np
from deepsignal_tpu.core.config import ModelConfig
from deepsignal_tpu.models.deepsignal import init_model, predictions

ITERS, TRIALS = 10, 3
B = 512

def make_batch(b, k=17, s=360, seed=0):
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
        for _ in range(ITERS):
            out = fn(*args)
        jax.block_until_ready(out)
        best.append((time.perf_counter() - t) / ITERS)
    return min(best) * 1e3

batch_h = make_batch(B)
print("platform:", jax.default_backend(), flush=True)
configs = []
for a in sys.argv[1:]:
    dtype, impl, rnn_only = a.split(",")
    configs.append((dtype, impl, rnn_only == "1"))
for dtype, impl, rnn_only in configs:
    prec = "highest" if dtype == "float32" else "default"
    t0 = time.perf_counter()
    cfg = ModelConfig(compute_dtype=dtype, matmul_precision=prec,
                      lstm_impl=impl, is_cnn=not rnn_only)
    model, variables = init_model(cfg, batch_size=8)
    variables = jax.device_put(variables)
    @jax.jit
    def fn(v, b):
        logits = model.apply(v, b["kmer"], b["means"], b["stds"],
                             b["sanums"], b["signals"], train=False)
        return jax.nn.sigmoid(logits), predictions(logits, 1.0)
    batch_d = jax.device_put(batch_h)
    jax.block_until_ready(batch_d)
    ms = bench(fn, variables, batch_d)
    tag = "rnn-only" if rnn_only else "full    "
    print(f"{dtype:9s} {impl:7s} {tag} device-resident={ms:7.2f}ms  "
          f"sites/s={B/ms*1e3:9.0f}  (setup {time.perf_counter()-t0:.0f}s)",
          flush=True)
    del variables, fn, batch_d
