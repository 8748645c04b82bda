"""Unique-content measurement protocol: the tunnel memoizes repeated
(program, args) executions, so every timed call must see fresh content."""
import time
import jax
import numpy as np
from deepsignal_tpu.core.config import ModelConfig
from deepsignal_tpu.models.deepsignal import DeepSignalNet, predictions

B, N = 512, 24

def make_batch(seed):
    rng = np.random.default_rng(seed)
    return dict(kmer=rng.integers(0, 4, (B, 17)).astype(np.int32),
                means=rng.normal(0, 1, (B, 17)).astype(np.float32),
                stds=np.abs(rng.normal(0, 1, (B, 17))).astype(np.float32),
                sanums=rng.integers(1, 40, (B, 17)).astype(np.float32),
                signals=rng.normal(0, 1, (B, 360)).astype(np.float32))

def init_on_device(cfg):
    import jax.numpy as jnp
    model = DeepSignalNet(cfg)
    dummy = {k: jnp.zeros((8, 17), jnp.int32) if k == "kmer" else
             jnp.zeros((8, 360 if k == "signals" else 17), jnp.float32)
             for k in ("kmer", "means", "stds", "sanums", "signals")}
    init_fn = jax.jit(lambda r, b: model.init(
        {"params": r}, b["kmer"], b["means"], b["stds"], b["sanums"],
        b["signals"], train=False))
    v = init_fn(jax.random.PRNGKey(0), dummy)
    jax.block_until_ready(v)
    return model, v

def main():
    print("platform:", jax.default_backend(), flush=True)
    jax.block_until_ready(jax.jit(lambda a: a + 1)(np.ones(8, np.float32)))

    seed = [0]
    def fresh_batches(n):
        out = []
        for _ in range(n):
            seed[0] += 1
            out.append(make_batch(seed[0]))
        return out

    # h2d with all-unique content
    hb = fresh_batches(N)
    t = time.perf_counter()
    devs = [jax.device_put(b) for b in hb]
    jax.block_until_ready(devs)
    ms = (time.perf_counter() - t) / N * 1e3
    print(f"h2d unique 875KB batches: {ms:6.2f} ms ({0.875/ms*1e3:.0f} MB/s)",
          flush=True)
    del devs

    for dtype, prec, impl in (("float32", "highest", "xla"),
                              ("float32", "highest", "pallas"),
                              ("bfloat16", "default", "xla"),
                              ("bfloat16", "default", "pallas")):
        cfg = ModelConfig(compute_dtype=dtype, matmul_precision=prec,
                          lstm_impl=impl)
        model, variables = init_on_device(cfg)

        @jax.jit
        def fn(v, b):
            logits = model.apply(v, b["kmer"], b["means"], b["stds"],
                                 b["sanums"], b["signals"], train=False)
            return jax.nn.sigmoid(logits), predictions(logits, 1.0)

        warm = jax.device_put(make_batch(999))
        jax.block_until_ready(fn(variables, warm))

        # pass 1: unique device-resident batches
        devs = [jax.device_put(b) for b in fresh_batches(N)]
        jax.block_until_ready(devs)
        t = time.perf_counter()
        outs = [fn(variables, d) for d in devs]
        jax.block_until_ready(outs)
        ms1 = (time.perf_counter() - t) / N * 1e3
        # pass 2: same batches again (memoization probe)
        t = time.perf_counter()
        outs = [fn(variables, d) for d in devs]
        jax.block_until_ready(outs)
        ms2 = (time.perf_counter() - t) / N * 1e3
        print(f"{dtype:9s} {impl:7s} unique: {ms1:7.2f} ms/batch "
              f"({B/ms1*1e3:7.0f} sites/s)   repeat: {ms2:7.2f} ms", flush=True)
        del model, variables, fn, devs

    # end-to-end model path with h2d, all unique, pipelined depth 2
    cfg = ModelConfig()
    model, variables = init_on_device(cfg)
    @jax.jit
    def fn(v, b):
        logits = model.apply(v, b["kmer"], b["means"], b["stds"],
                             b["sanums"], b["signals"], train=False)
        return jax.nn.sigmoid(logits), predictions(logits, 1.0)
    jax.block_until_ready(fn(variables, jax.device_put(make_batch(777))))
    hb = fresh_batches(N)
    t = time.perf_counter()
    outs = []
    devs = [jax.device_put(hb[0]), jax.device_put(hb[1])]
    for k in range(N):
        if k + 2 < N:
            devs.append(jax.device_put(hb[k + 2]))
        outs.append(fn(variables, devs.pop(0)))
    jax.block_until_ready(outs)
    ms = (time.perf_counter() - t) / N * 1e3
    print(f"f32 h2d+compute pipelined, unique: {ms:7.2f} ms/batch "
          f"({B/ms*1e3:7.0f} sites/s)", flush=True)

if __name__ == "__main__":
    main()
