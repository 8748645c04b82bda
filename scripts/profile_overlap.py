"""Measure whether async device_put overlaps with compute through the axon
tunnel, and what the pipelined steady-state batch time is.  Dev tool."""

import time

import jax
import numpy as np

from deepsignal_tpu.core.config import ModelConfig
from deepsignal_tpu.models.deepsignal import init_model, predictions

B = 512
ITERS = 20


def make_batches(n, b=B, k=17, s=360):
    rng = np.random.default_rng(0)
    return [dict(
        kmer=rng.integers(0, 4, (b, k)).astype(np.int32),
        means=rng.normal(0, 1, (b, k)).astype(np.float32),
        stds=np.abs(rng.normal(0, 1, (b, k))).astype(np.float32),
        sanums=rng.integers(1, 40, (b, k)).astype(np.float32),
        signals=rng.normal(0, 1, (b, s)).astype(np.float32)) for _ in range(n)]


def main():
    print("platform:", jax.default_backend())
    for dtype in ("float32", "bfloat16"):
        prec = "highest" if dtype == "float32" else "default"
        cfg = ModelConfig(compute_dtype=dtype, matmul_precision=prec)
        model, variables = init_model(cfg, batch_size=8)
        variables = jax.device_put(variables)

        @jax.jit
        def fn(variables, b):
            logits = model.apply(variables, b["kmer"], b["means"], b["stds"],
                                 b["sanums"], b["signals"], train=False)
            return jax.nn.sigmoid(logits), predictions(logits, 1.0)

        batches = make_batches(4)
        out = fn(variables, jax.device_put(batches[0]))
        jax.block_until_ready(out)

        # serial: h2d inside the call
        t = time.perf_counter()
        for i in range(ITERS):
            out = fn(variables, batches[i % 4])
        jax.block_until_ready(out)
        serial = (time.perf_counter() - t) / ITERS * 1e3

        # pipelined: device_put for batch i+1 issued before blocking on i
        dev = jax.device_put(batches[0])
        outs = []
        t = time.perf_counter()
        for i in range(ITERS):
            nxt = jax.device_put(batches[(i + 1) % 4])
            outs.append(fn(variables, dev))
            dev = nxt
        jax.block_until_ready(outs)
        pipe = (time.perf_counter() - t) / ITERS * 1e3

        # deeper pipeline: keep 3 transfers in flight
        devs = [jax.device_put(b) for b in batches[:3]]
        outs = []
        t = time.perf_counter()
        for i in range(ITERS):
            devs.append(jax.device_put(batches[(i + 3) % 4]))
            outs.append(fn(variables, devs.pop(0)))
        jax.block_until_ready(outs)
        deep = (time.perf_counter() - t) / ITERS * 1e3

        print(f"{dtype:9s} serial={serial:7.2f}ms  pipe1={pipe:7.2f}ms  "
              f"pipe3={deep:7.2f}ms  reads/s(pipe3)={B / deep * 1e3 / 100:.0f}")


if __name__ == "__main__":
    main()
