"""On-hardware parity check: TPU production inference vs CPU true-f32.

The oracle/golden tests pin the f32 path on CPU (conftest forces the CPU
backend); this script closes the loop on REAL hardware: the same variables
and feature batch scored through the production ModCaller compute on the
TPU (Pallas LSTM + MXU matmuls at matmul_precision="highest") must produce
normalized probabilities within float32 tolerance of the CPU run, and
identical binary calls away from the 0.5 boundary.

Run on the bench host:  PYTHONPATH=. python scripts/check_tpu_parity.py
"""
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from deepsignal_tpu.core.config import ModelConfig
    from deepsignal_tpu.models.deepsignal import (DeepSignalNet, init_model,
                                                  predictions)

    assert jax.default_backend() == "tpu", (
        "run on the TPU host (default backend is %s)" % jax.default_backend())
    cpu = jax.devices("cpu")[0]

    B = 2048
    rng = np.random.default_rng(7)
    batch = dict(kmer=rng.integers(0, 4, (B, 17)).astype(np.int32),
                 means=rng.normal(0, 1, (B, 17)).astype(np.float32),
                 stds=np.abs(rng.normal(0, 1, (B, 17))).astype(np.float32),
                 sanums=rng.integers(1, 40, (B, 17)).astype(np.float32),
                 signals=rng.normal(0, 1, (B, 360)).astype(np.float32))

    results = {}
    for dev_name, dev, dtype, prec, impl in (
            ("cpu", cpu, "float32", "highest", "xla"),
            ("tpu-f32", None, "float32", "highest", "auto"),
            ("tpu-bf16", None, "bfloat16", "default", "auto")):
        cfg = ModelConfig(compute_dtype=dtype, matmul_precision=prec,
                          lstm_impl=impl)
        model = DeepSignalNet(cfg)
        if "variables" not in results:
            _, variables = init_model(ModelConfig(), batch_size=8)
            results["variables"] = variables
        variables = results["variables"]

        def infer(v, b):
            logits = model.apply(v, b["kmer"], b["means"], b["stds"],
                                 b["sanums"], b["signals"], train=False)
            act = jax.nn.sigmoid(logits)
            return act, predictions(logits, 1.0)

        fn = jax.jit(infer, device=dev) if dev is not None else jax.jit(infer)
        act, pred = fn(variables, batch)
        act = np.asarray(act, np.float32)
        total = act[:, 0] + act[:, 1]
        results[dev_name] = (act[:, 1] / total, np.asarray(pred))
        print(f"{dev_name}: done", flush=True)

    p_cpu, c_cpu = results["cpu"]
    for name in ("tpu-f32", "tpu-bf16"):
        p, c = results[name]
        dp = np.abs(p - p_cpu)
        flips = int((c != c_cpu).sum())
        margin = np.abs(p_cpu - 0.5)
        flips_clear = int(((c != c_cpu) & (margin > 1e-3)).sum())
        print(f"{name} vs cpu-f32: max|dprob1|={dp.max():.3e} "
              f"mean={dp.mean():.3e}  call flips={flips}/{len(c)} "
              f"(flips with margin>1e-3: {flips_clear})", flush=True)
        if name == "tpu-f32":
            ok = dp.max() < 5e-5 and flips_clear == 0
            print("tpu-f32 parity:", "OK" if ok else "FAIL", flush=True)
            if not ok:
                return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
