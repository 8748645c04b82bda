"""On-hardware parity check: TPU production inference vs CPU true-f32.

The oracle/golden tests pin the f32 path on CPU (conftest forces the CPU
backend); this script closes the loop on REAL hardware: the same variables
and feature batches scored through the production ModCaller on the TPU
(Pallas LSTM + MXU matmuls) must produce normalized probabilities within
float32 tolerance of the CPU run for the f32 path, and identical binary
calls for the shipped bfloat16 path.

Round-5 upgrade (VERDICT r4 #4): the bf16 ship gate scales to >=50k sites
and reports the |p1 - 0.5| margin distribution, so the shipped default's
flip-rate bound is statistical, not anecdotal: a call can only flip if its
f32 margin is smaller than the bf16 drift, so
  P(flip) <= fraction of sites with margin < max measured |dprob|.

Run on the bench host:
  PYTHONPATH=.:$PYTHONPATH python scripts/check_tpu_parity.py [--sites N]
"""
import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sites", type=int, default=50_000)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    import jax

    from deepsignal_tpu.core.config import ModelConfig
    from deepsignal_tpu.io.feature_codec import FeatureBatch
    from deepsignal_tpu.models.deepsignal import (DeepSignalNet, init_model,
                                                  predictions)
    from deepsignal_tpu.runtime.caller import ModCaller

    assert jax.default_backend() == "tpu", (
        "run on the TPU host (default backend is %s)" % jax.default_backend())
    cpu = jax.devices("cpu")[0]

    N, B = args.sites, args.batch
    rng = np.random.default_rng(args.seed)
    _, variables = init_model(ModelConfig(), batch_size=8)

    # CPU true-f32 oracle: jit pinned to the host CPU device, xla lstm,
    # matmul "highest" — the tree the golden tests certify.
    cfg_cpu = ModelConfig(compute_dtype="float32", matmul_precision="highest",
                          lstm_impl="xla")
    model_cpu = DeepSignalNet(cfg_cpu)

    def infer_cpu(v, b):
        logits = model_cpu.apply(v, b["kmer"], b["means"], b["stds"],
                                 b["sanums"], b["signals"], train=False)
        return jax.nn.sigmoid(logits), predictions(logits, 1.0)

    fn_cpu = jax.jit(infer_cpu, device=cpu)

    # TPU production paths: the real ModCaller (wire packing, fixed-shape
    # jit, async dispatch) — f32 parity mode and the shipped bf16 default.
    caller32 = ModCaller(ModelConfig(compute_dtype="float32",
                                     matmul_precision="highest"),
                         variables, batch_size=B)
    caller16 = ModCaller(ModelConfig(compute_dtype="bfloat16",
                                     matmul_precision="default"),
                         variables, batch_size=B)

    p_cpu = np.empty(N, np.float32)
    c_cpu = np.empty(N, np.int64)
    res = {"tpu-f32": (np.empty(N, np.float32), np.empty(N, np.int64)),
           "tpu-bf16": (np.empty(N, np.float32), np.empty(N, np.int64))}

    done = 0
    while done < N:
        n = min(B, N - done)
        batch = dict(kmer=rng.integers(0, 4, (n, 17)).astype(np.int32),
                     means=rng.normal(0, 1, (n, 17)).astype(np.float32),
                     stds=np.abs(rng.normal(0, 1, (n, 17))).astype(
                         np.float32),
                     sanums=rng.integers(1, 40, (n, 17)).astype(np.float32),
                     signals=rng.normal(0, 1, (n, 360)).astype(np.float32))
        act, pred = fn_cpu(variables, batch)
        act = np.asarray(act, np.float32)
        p_cpu[done:done + n] = act[:, 1] / (act[:, 0] + act[:, 1])
        c_cpu[done:done + n] = np.asarray(pred)[:n]

        fb = FeatureBatch(
            sampleinfo=[f"chr1\t{i}\t+\t{i}\tr{i}\tt"
                        for i in range(done, done + n)],
            kmers=batch["kmer"], means=batch["means"], stds=batch["stds"],
            lens=batch["sanums"].astype(np.int64),
            signals=batch["signals"], labels=np.ones(n, np.int32))
        for name, caller in (("tpu-f32", caller32), ("tpu-bf16", caller16)):
            _, pred_t, (p0_t, p1_t) = caller.call_feature_batch(fb)
            res[name][0][done:done + n] = p1_t
            res[name][1][done:done + n] = pred_t
        done += n
        print(f"\r{done}/{N} sites", end="", flush=True)
    print()

    margin = np.abs(p_cpu - 0.5)
    qs = [0, 0.001, 0.01, 0.1, 0.5]
    print("f32 |p1-0.5| margin percentiles:",
          {f"p{q * 100:g}": float(np.quantile(margin, q)) for q in qs})

    rc = 0
    for name in ("tpu-f32", "tpu-bf16"):
        p, c = res[name]
        dp = np.abs(p - p_cpu)
        flips = int((c != c_cpu).sum())
        max_dp = float(dp.max())
        # a flip REQUIRES margin < drift: the fraction of sites inside the
        # measured drift band bounds the flip probability
        at_risk = int((margin < max_dp).sum())
        print(f"{name} vs cpu-f32: max|dprob1|={max_dp:.3e} "
              f"mean={dp.mean():.3e}  call flips={flips}/{N}  "
              f"sites with margin<max_drift: {at_risk} "
              f"(flip-rate bound {max(at_risk, 1) / N:.1e})", flush=True)
        if name == "tpu-f32":
            flips_clear = int(((c != c_cpu) & (margin > 1e-3)).sum())
            ok = max_dp < 5e-5 and flips_clear == 0
            print("tpu-f32 parity:", "OK" if ok else "FAIL", flush=True)
            rc |= 0 if ok else 1
        else:
            ok = flips == 0
            print("tpu-bf16 ship gate (0 flips at %d sites):" % N,
                  "OK" if ok else "FAIL", flush=True)
            rc |= 0 if ok else 2
    return rc


if __name__ == "__main__":
    sys.exit(main())
