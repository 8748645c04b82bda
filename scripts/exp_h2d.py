"""Scratch experiment: h2d-inclusive model throughput vs batch size and
wire dtype. Fresh content every call (tunnel memoizes)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from deepsignal_tpu.core.config import ModelConfig
from deepsignal_tpu.models.deepsignal import DeepSignalNet, predictions

K, S = 17, 360


def make_batch(rng, b, wire="f32"):
    kmer = rng.integers(0, 4, (b, K))
    means = rng.normal(0, 1, (b, K)).astype(np.float32)
    stds = np.abs(rng.normal(0, 1, (b, K))).astype(np.float32)
    sanums = rng.integers(1, 40, (b, K))
    signals = rng.normal(0, 1, (b, S)).astype(np.float32)
    if wire == "f32":
        return dict(kmer=kmer.astype(np.int32), means=means, stds=stds,
                    sanums=sanums.astype(np.float32), signals=signals)
    if wire == "packed":  # lossless: int8 kmer, uint16 sanums
        return dict(kmer=kmer.astype(np.int8), means=means, stds=stds,
                    sanums=sanums.astype(np.uint16), signals=signals)
    if wire == "bf16":  # int8 kmer, uint16 sanums, bf16 floats
        bf = jnp.bfloat16
        return dict(kmer=kmer.astype(np.int8),
                    means=means.astype(bf), stds=stds.astype(bf),
                    sanums=sanums.astype(np.uint16),
                    signals=signals.astype(bf))
    raise ValueError(wire)


def build(cfg, compute_dtype):
    model = DeepSignalNet(cfg)

    @jax.jit
    def fn(variables, b):
        kmer = b["kmer"].astype(jnp.int32)
        sanums = b["sanums"].astype(compute_dtype)
        means = b["means"].astype(compute_dtype)
        stds = b["stds"].astype(compute_dtype)
        signals = b["signals"].astype(compute_dtype)
        logits = model.apply(variables, kmer, means, stds, sanums,
                             signals, train=False)
        return jax.nn.sigmoid(logits), predictions(logits, 1.0)

    return fn


def init_vars(cfg):
    model = DeepSignalNet(cfg)
    dummy = dict(kmer=jnp.zeros((8, K), jnp.int32),
                 means=jnp.zeros((8, K), jnp.float32),
                 stds=jnp.zeros((8, K), jnp.float32),
                 sanums=jnp.zeros((8, K), jnp.float32),
                 signals=jnp.zeros((8, S), jnp.float32))
    init_fn = jax.jit(lambda r, b: model.init(
        {"params": r}, b["kmer"], b["means"], b["stds"], b["sanums"],
        b["signals"], train=False))
    v = init_fn(jax.random.PRNGKey(0), dummy)
    jax.block_until_ready(v)
    return v


def run(cfg, variables, wire, batch, iters=8, depth=1):
    rng = np.random.default_rng(0)
    compute_dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                     else jnp.float32)
    fn = build(cfg, compute_dtype)
    # warmup/compile
    out = fn(variables, jax.device_put(make_batch(rng, batch, wire)))
    jax.block_until_ready(out)
    rates = []
    for _ in range(3):
        fresh = [make_batch(rng, batch, wire) for _ in range(iters + depth)]
        t = time.perf_counter()
        outs = []
        devs = [jax.device_put(fresh[i]) for i in range(depth)]
        for i in range(iters):
            devs.append(jax.device_put(fresh[i + depth]))
            outs.append(fn(variables, devs.pop(0)))
        jax.block_until_ready(outs)
        rates.append(batch * iters / (time.perf_counter() - t))
    r = float(np.median(rates))
    print(f"wire={wire:7s} batch={batch:5d} depth={depth} "
          f"-> {r:9.0f} sites/s  ({batch / r * 1e3:.2f} ms/batch)",
          flush=True)
    return r


if __name__ == "__main__":
    cfg32 = ModelConfig()
    v = init_vars(cfg32)
    print("== f32 compute ==", flush=True)
    for wire in ("f32", "packed"):
        for batch in (512, 2048, 4096):
            run(cfg32, v, wire, batch)
    print("== bf16 compute ==", flush=True)
    cfg16 = ModelConfig(compute_dtype="bfloat16", matmul_precision="default")
    for wire in ("packed", "bf16"):
        for batch in (512, 2048, 4096):
            run(cfg16, v, wire, batch)
    # deeper pipeline on the best configs
    print("== depth sweep ==", flush=True)
    run(cfg32, v, "packed", 2048, depth=2)
    run(cfg16, v, "bf16", 2048, depth=2)

