"""call_mods throughput benchmark.

Prints ONE JSON line:
  {"metric": "call_mods_reads_per_s_e2e", "value": N, "unit": "reads/s",
   "vs_baseline": R, ...extra fields...}

- value: measured END-TO-END call_mods rate — fast5 dir -> multiprocess
  featurize -> jit TPU inference -> 10-column call TSV — on a >=500-read
  synthetic corpus (6 kb reads, CpGs planted every 60 bases = yeast-like
  density), warm (model compiled; worker spawn included in the wall clock,
  and a separate steady_state rate excludes the startup ramp), on the
  SHIPPED default path (bfloat16, runtime/caller.py); e2e_f32 carries the
  reference-parity mode.
- train_* fields: serial-chained optimizer-step rates (fwd+bwd+Adam) with
  their own physics gate, plus a torch-CPU train-step baseline ratio.
- vs_baseline: our e2e sites/s vs a measured torch-CPU implementation of the
  reference architecture doing MODEL-ONLY inference (generous to the
  baseline: the TF1-CPU reference also pays featurization, which is slower
  than its model path).  Cached in bench_baseline.json.
- model_* fields: chip-side model rates under a SERIAL-CHAINED protocol —
  call i+1 consumes call i's output (a data dependency XLA cannot remove),
  and the loop ends with an actual device->host fetch of the chained scalar.
  Rationale: the bench host reaches its chip through an experimental tunnel
  ('axon') where ``block_until_ready`` has been observed to return before
  execution finishes, which made round-2 numbers physically impossible
  (3-6 PFLOP/s on one chip).  Only a value fetch is trusted as a sync point.
- every model measurement carries {flops_per_site, mfu, valid}: flops from
  XLA ``cost_analysis`` on the exact compiled step, mfu = rate *
  flops_per_site / chip_peak_flops, and valid=false (excluded from any
  headline) whenever the implied MFU exceeds 1.0 — a physics gate no real
  measurement can trip.
"""

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

BATCH = 512            # reference-parity batch (TF1 default)
DEVICE_BATCH = 16384   # TPU-tuned device batch (per-call latency amortized)
TRAIN_BATCH_TPU = 4096  # TPU-tuned train batch (same sweep optimum as infer)
SERIAL_ITERS = 8
N_READS_E2E = 500      # e2e corpus size (reads); ~100 CpG sites per read
READ_LEN = 6000
# Fixed per-tag corpus seeds: cold/warm score DISTINCT corpora (so warm can
# never be flattered by data caching) but each tag's corpus is identical
# run-to-run — ``hash(tag)`` was salted per process (PYTHONHASHSEED) and made
# consecutive bench runs incomparable.  The warm run repeats WARM_REPEATS
# times on distinct fixed corpora so run-to-run variance lands in the
# artifact (min/median/max) instead of the prose (VERDICT r4 #1a).
TAG_SEEDS = {"cold": 1001, "warm": 2002, "warm2": 2003, "warm3": 2004,
             "hostceil": 3005, "filemode": 4006}
WARM_REPEATS = 3
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "bench_baseline.json")

# Dense peak of the bench chip, used for the MFU physics gate.  TPU v5 lite
# (v5e): 197 TFLOP/s bf16.  f32 cannot exceed the bf16 peak on this hardware,
# so one conservative ceiling serves both dtypes.
CHIP_PEAK_FLOPS = {
    "TPU v5 lite": 197e12,
    "TPU v4 lite": 138e12,
}
DEFAULT_PEAK_FLOPS = 197e12


def _chip_peak() -> float:
    import jax
    kind = jax.devices()[0].device_kind
    return CHIP_PEAK_FLOPS.get(kind, DEFAULT_PEAK_FLOPS)


def _make_batch(rng, b, k=17, s=360, wire=None):
    """wire=None: plain f32/int32 arrays.  wire="f32"/"bf16": the ModCaller
    wire format (int8 kmer, uint16 sanums, f32 or bf16 floats)."""
    kmer = rng.integers(0, 4, (b, k))
    means = rng.normal(0, 1, (b, k)).astype(np.float32)
    stds = np.abs(rng.normal(0, 1, (b, k))).astype(np.float32)
    sanums = rng.integers(1, 40, (b, k))
    signals = rng.normal(0, 1, (b, s)).astype(np.float32)
    if wire is None:
        return dict(kmer=kmer.astype(np.int32), means=means, stds=stds,
                    sanums=sanums.astype(np.float32), signals=signals)
    import jax.numpy as jnp
    f = np.dtype(jnp.bfloat16) if wire == "bf16" else np.dtype(np.float32)
    return dict(kmer=kmer.astype(np.int8),
                means=means.astype(f), stds=stds.astype(f),
                sanums=sanums.astype(np.uint16),
                signals=signals.astype(f))


def _write_synthetic_reads(f5dir: str, n_reads: int,
                           read_len: int = READ_LEN, seed: int = 1234) -> int:
    """Tombo-layout fast5s with CpGs planted every 60 bases (yeast-like
    density).  Returns the expected motif-site count."""
    from deepsignal_tpu.io.fast5 import write_synthetic_fast5

    rng = np.random.default_rng(seed)
    n_sites = 0
    for i in range(n_reads):
        lens = rng.integers(5, 15, read_len)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        # no-G background + planted CGs -> exactly one motif site per 60
        # bases (~100/read), matching yeast CpG density so reads/s is honest
        seq = rng.choice(list("ACT"), read_len)
        pos = np.arange(8, read_len - 9, 60)
        seq[pos] = "C"
        seq[pos + 1] = "G"
        raw = rng.integers(300, 600, int(lens.sum())).astype(np.int16)
        write_synthetic_fast5(
            os.path.join(f5dir, f"r{i}.fast5"), f"read{i}", raw, starts,
            lens, "".join(seq), "chr1", 1000 * i, "+" if i % 2 == 0 else "-")
        n_sites += len(pos)
    return n_sites


def _init_device_variables(cfg):
    """Init params directly on device (no host round-trip: the joint head
    alone is ~145 MB and the tunnel is slow)."""
    import jax
    import jax.numpy as jnp

    from deepsignal_tpu.models.deepsignal import DeepSignalNet

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
    variables = init_fn(jax.random.PRNGKey(0), dummy)
    jax.block_until_ready(variables)
    return variables


def xla_flops_per_site(cfg, batch, variables=None) -> float:
    """FLOPs/site of the inference step pinned to the fully-XLA-visible path.

    ``cost_analysis`` cannot see inside a Pallas kernel, so configs running
    the fused Pallas LSTM undercount FLOPs (~192M vs the true ~231M/site) and
    the MFU physics gate silently weakens.  The denominator is therefore
    computed ONCE from an ``lstm_impl="xla"`` compile of the same step and
    reused for every full-model row (the op inventory — and hence MACs — is
    identical across lstm_impl and compute_dtype)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from deepsignal_tpu.models.deepsignal import DeepSignalNet, predictions

    cfg = dataclasses.replace(cfg, lstm_impl="xla")
    if variables is None:
        variables = _init_device_variables(cfg)
    model = DeepSignalNet(cfg)

    @jax.jit
    def step(variables, b, acc):
        means = b["means"] + (acc * 1e-12).astype(b["means"].dtype)
        logits = model.apply(variables, b["kmer"].astype(jnp.int32), means,
                             b["stds"], b["sanums"], b["signals"],
                             train=False)
        act = jax.nn.sigmoid(logits)
        pred = predictions(logits, 1.0)
        return acc + act.astype(jnp.float32).sum() + pred.sum(), act, pred

    rng = np.random.default_rng(0)
    d = jax.device_put(_make_batch(rng, batch, k=cfg.kmer_len,
                                   s=cfg.cent_signals_len))
    ca = step.lower(variables, d, jnp.float32(0.0)).compile().cost_analysis()
    if not ca or "flops" not in ca:
        return float("nan")
    return float(ca["flops"]) / batch


def measure_serial_model(cfg, batch=DEVICE_BATCH, wire=None,
                         iters=SERIAL_ITERS, variables=None,
                         flops_per_site=None) -> dict:
    """Serial-chained device rate + FLOPs/MFU accounting.

    Protocol: step i+1 perturbs its input by a scalar accumulated from step
    i's logits, so the XLA dataflow graph forces strictly serial execution —
    no backend can overlap, memoize, or fan out the chain (each call's
    inputs depend on the previous call's real output).  The loop is closed
    by ``float(acc)``: an actual device->host fetch is the only sync
    primitive trusted through the tunnel (see module docstring).
    """
    import jax
    import jax.numpy as jnp

    from deepsignal_tpu.models.deepsignal import DeepSignalNet, predictions

    if variables is None:
        variables = _init_device_variables(cfg)
    model = DeepSignalNet(cfg)

    @jax.jit
    def step(variables, b, acc):
        means = b["means"] + (acc * 1e-12).astype(b["means"].dtype)
        logits = model.apply(variables, b["kmer"].astype(jnp.int32), means,
                             b["stds"], b["sanums"], b["signals"],
                             train=False)
        act = jax.nn.sigmoid(logits)
        pred = predictions(logits, 1.0)
        return acc + act.astype(jnp.float32).sum() + pred.sum(), act, pred

    rng = np.random.default_rng(0)
    devs = [jax.device_put(_make_batch(rng, batch, wire=wire))
            for i in range(iters)]
    acc = jax.device_put(jnp.float32(0.0))

    if flops_per_site is None:
        # fallback: flops of this exact compiled step (undercounts when the
        # Pallas LSTM is active — prefer passing the xla_flops_per_site
        # denominator)
        flops_per_site = float("nan")
        try:
            ca = step.lower(variables, devs[0], acc).compile().cost_analysis()
            if ca and "flops" in ca:
                flops_per_site = float(ca["flops"]) / batch
        except Exception:
            pass

    # warmup (compile) + one full fetch
    acc, _, _ = step(variables, devs[0], acc)
    _ = float(acc)

    t0 = time.perf_counter()
    for i in range(iters):
        acc, _, _ = step(variables, devs[i], acc)
    final = float(acc)  # real d2h fetch = the only trusted sync
    dt = time.perf_counter() - t0
    assert np.isfinite(final), "serial chain produced a non-finite value"

    rate = batch * iters / dt
    peak = _chip_peak()
    mfu = rate * flops_per_site / peak if np.isfinite(flops_per_site) \
        else float("nan")
    return {"batch": batch,
            "serial_ms_per_batch": round(dt / iters * 1e3, 2),
            "device_sites_per_s": round(rate),
            "flops_per_site": round(flops_per_site),
            "mfu": round(mfu, 4),
            "valid": bool(mfu <= 1.0) if np.isfinite(mfu) else False}


def measure_h2d_pipelined(cfg, batch=DEVICE_BATCH, wire=None, iters=8,
                          variables=None, serial_rate=None) -> dict:
    """Model rate including fresh host->device transfer of every batch,
    pipelined one batch ahead (the production ModCaller dispatch pattern).

    Diagnostic only: the loop fetches every output back to the host (the
    production path also fetches all probabilities), so the measurement is
    fetch-synced.  ``valid`` additionally requires the rate not to exceed
    the serial-chained device rate — transfers can at best fully overlap
    compute, never beat it."""
    import jax
    import jax.numpy as jnp

    from deepsignal_tpu.models.deepsignal import DeepSignalNet, predictions

    if variables is None:
        variables = _init_device_variables(cfg)
    model = DeepSignalNet(cfg)

    @jax.jit
    def fn(variables, b):
        logits = model.apply(variables, b["kmer"].astype(jnp.int32),
                             b["means"], b["stds"], b["sanums"], b["signals"],
                             train=False)
        return jax.nn.sigmoid(logits), predictions(logits, 1.0)

    rng = np.random.default_rng(1)
    out = fn(variables, jax.device_put(_make_batch(rng, batch, wire=wire)))
    _ = np.asarray(out[0]).sum()  # compile + fetch-sync

    fresh = [_make_batch(rng, batch, wire=wire) for _ in range(iters + 1)]
    t0 = time.perf_counter()
    d = jax.device_put(fresh[0])
    outs = []
    for i in range(iters):
        nxt = jax.device_put(fresh[i + 1])
        outs.append(fn(variables, d))
        d = nxt
    got = sum(float(np.asarray(a).astype(np.float64).sum()) for a, _ in outs)
    dt = time.perf_counter() - t0
    assert np.isfinite(got)

    rate = batch * iters / dt
    peak = _chip_peak()
    valid = True
    if serial_rate is not None and rate > 1.1 * serial_rate:
        valid = False  # cannot beat the serial device rate
    return {"batch": batch,
            "with_h2d_sites_per_s": round(rate),
            "ms_per_batch_with_h2d": round(batch / rate * 1e3, 2),
            "valid": valid,
            # when h2d rides the experimental tunnel (detected by its env
            # gate), bandwidth swings 11-54 MB/s run-to-run — diagnostic
            # only, not representative of real PCIe (docs/PERF.md)
            "tunnel_limited": bool(os.environ.get("PALLAS_AXON_POOL_IPS"))}


def _make_train_batch(rng, b, k=17, s=360):
    d = _make_batch(rng, b, k=k, s=s)
    d["labels"] = rng.integers(0, 2, b).astype(np.int32)
    return d


def _build_train_step(cfg, batch):
    """Jitted chained training step + fresh state for the bench.

    The step is the production ``Trainer`` math (same loss helper, Adam via
    optax, dropout + BN stat updates — train/trainer.py:107-128); rebuilt
    here only to thread the serial-chaining scalar through jit: step i+1's
    batch is perturbed by a scalar accumulated from step i's loss, so the XLA
    dataflow forces strictly serial execution (see module docstring).
    Returns (step, params, batch_stats, opt_state, example_device_batch)."""
    import jax
    import jax.numpy as jnp
    import optax

    from deepsignal_tpu.core.config import TrainConfig
    from deepsignal_tpu.models.deepsignal import DeepSignalNet, init_model
    from deepsignal_tpu.train.trainer import masked_mean_loss

    tcfg = TrainConfig(batch_size=batch, seed=0)
    model = DeepSignalNet(cfg)
    _, variables = init_model(cfg, batch_size=8)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optax.adam(tcfg.learning_rate)
    opt_state = jax.jit(tx.init)(params)

    def train_step(params, batch_stats, opt_state, b, rng, acc):
        means = b["means"] + (acc * 1e-12).astype(b["means"].dtype)
        mask = jnp.ones(b["labels"].shape[0], jnp.float32)

        def loss_fn(p):
            logits, new_vars = model.apply(
                {"params": p, "batch_stats": batch_stats},
                b["kmer"], means, b["stds"], b["sanums"], b["signals"],
                train=True, keep_prob=tcfg.keep_prob,
                mutable=["batch_stats"], rngs={"dropout": rng})
            loss = masked_mean_loss(logits, b["labels"], mask,
                                    cfg.class_num, tcfg.pos_weight)
            return loss, new_vars["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, acc + loss.astype(jnp.float32)

    step = jax.jit(train_step, donate_argnums=(0, 1, 2))
    rng = np.random.default_rng(3)
    d = jax.device_put(_make_train_batch(rng, batch, k=cfg.kmer_len,
                                         s=cfg.cent_signals_len))
    return step, params, batch_stats, opt_state, d


def xla_train_flops_per_site(cfg, batch) -> float:
    """Training-step FLOPs/site (fwd + bwd + Adam) from an
    ``lstm_impl="xla"`` compile — see ``xla_flops_per_site``."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    cfg = dataclasses.replace(cfg, lstm_impl="xla")
    step, params, batch_stats, opt_state, d = _build_train_step(cfg, batch)
    ca = step.lower(params, batch_stats, opt_state, d, jax.random.PRNGKey(7),
                    jnp.float32(0.0)).compile().cost_analysis()
    if not ca or "flops" not in ca:
        return float("nan")
    return float(ca["flops"]) / batch


def measure_serial_train(cfg, batch=BATCH, iters=SERIAL_ITERS,
                         flops_per_site=None) -> dict:
    """Serial-chained optimizer-step rate (reference cost center:
    train_model.py:144-161 — one sess.run([cost, train_opt]) per batch).

    Same timing rules as inference: chained dataflow + ``float(acc)`` fetch
    as the only trusted sync.  ``flops_per_site`` should come from
    ``xla_train_flops_per_site`` so the MFU gate is pinned to the
    XLA-visible op count (fwd + bwd + Adam)."""
    import jax
    import jax.numpy as jnp

    step, params, batch_stats, opt_state, _ = _build_train_step(cfg, batch)
    rng = np.random.default_rng(3)
    devs = [jax.device_put(_make_train_batch(rng, batch, k=cfg.kmer_len,
                                             s=cfg.cent_signals_len))
            for _ in range(iters)]
    drop = jax.device_put(jax.random.PRNGKey(7))
    acc = jax.device_put(jnp.float32(0.0))

    # warmup (compile) + fetch-sync
    params, batch_stats, opt_state, acc = step(params, batch_stats,
                                               opt_state, devs[0], drop, acc)
    _ = float(acc)

    t0 = time.perf_counter()
    for i in range(iters):
        params, batch_stats, opt_state, acc = step(
            params, batch_stats, opt_state, devs[i], drop, acc)
    final = float(acc)  # d2h fetch = trusted sync
    dt = time.perf_counter() - t0
    assert np.isfinite(final), "train chain produced a non-finite loss"

    rate = batch * iters / dt
    peak = _chip_peak()
    if flops_per_site is None:
        flops_per_site = float("nan")
    mfu = rate * flops_per_site / peak if np.isfinite(flops_per_site) \
        else float("nan")
    return {"batch": batch,
            "ms_per_step": round(dt / iters * 1e3, 2),
            "sites_per_s": round(rate),
            "flops_per_site": (round(flops_per_site)
                               if np.isfinite(flops_per_site) else None),
            "mfu": round(mfu, 4) if np.isfinite(mfu) else None,
            "valid": bool(mfu <= 1.0) if np.isfinite(mfu) else False}


class _MeteredBatches:
    """Wrap a FeatureBatch iterator, recording first-yield time and site
    counts so the e2e run can report a steady-state rate that excludes the
    worker spawn/compile ramp."""

    def __init__(self, it):
        self.it = it
        self.t_first = None
        self.sites_first = 0
        self.sites = 0

    def __iter__(self):
        for fb in self.it:
            if self.t_first is None:
                self.t_first = time.perf_counter()
                self.sites_first = len(fb)
            self.sites += len(fb)
            yield fb


def measure_e2e(compute_dtype=None, n_reads=None) -> dict:
    """fast5 dir -> streaming featurize -> jit call -> TSV, >=500 reads.

    ``cold`` = one-shot wall clock including checkpoint load, param upload,
    and a FULL jit compile (the CLI additionally keeps a persistent XLA
    cache, so real repeat runs pay less; the bench compiles fresh every
    time so cold numbers stay comparable across rounds); ``warm`` = the same
    pipeline with the caller already compiled, on FRESH reads (what a long
    run converges to; fresh data so no tunnel-side caching can flatter it).
    ``steady_state_sites_per_s`` times from the first featurized batch to
    the end — excluding worker spawn — which is the long-run rate."""
    from deepsignal_tpu.core.config import FeatureConfig, ModelConfig
    from deepsignal_tpu.models.deepsignal import init_model
    from deepsignal_tpu.runtime.caller import ModCaller, call_mods_on_batches
    from deepsignal_tpu.runtime.pipeline import stream_fast5_feature_batches
    from deepsignal_tpu.train.checkpoints import (load_checkpoint,
                                                  save_checkpoint)

    tiny = os.environ.get("BENCH_TINY") == "1"
    tmp = tempfile.mkdtemp(prefix="bench_e2e_")
    try:
        if n_reads is None:
            n_reads = 6 if tiny else N_READS_E2E
        cfg = (ModelConfig(lstm_hidden=128, inception_times=2,
                           inception_blocks=(1, 1, 1)) if tiny
               else ModelConfig())
        if compute_dtype == "bfloat16":
            cfg = ModelConfig(**{**cfg.__dict__,
                                 "compute_dtype": "bfloat16",
                                 "matmul_precision": "default"})
        model, variables = init_model(cfg, batch_size=8)
        ckpt = os.path.join(tmp, "model.ckpt")
        save_checkpoint(ckpt, cfg, variables)

        def one_run(tag, caller=None):
            f5dir = os.path.join(tmp, f"f5_{tag}")
            os.makedirs(f5dir)
            n_sites_exp = _write_synthetic_reads(f5dir, n_reads=n_reads,
                                                 seed=TAG_SEEDS.get(tag, 42))
            out_tsv = os.path.join(tmp, f"calls_{tag}.tsv")
            t0 = time.perf_counter()
            if caller is None:  # cold: includes ckpt load + compile
                ld_cfg, ld_vars = load_checkpoint(ckpt)
                caller = ModCaller(ld_cfg, ld_vars, batch_size=4096)
            metered = _MeteredBatches(stream_fast5_feature_batches(
                f5dir, FeatureConfig(), nproc=3, f5_batch_num=25))
            n_calls = call_mods_on_batches(caller, metered, out_tsv)
            t_end = time.perf_counter()
            dt = t_end - t0
            assert n_calls >= 0.9 * n_sites_exp, (n_calls, n_sites_exp)
            steady = ((metered.sites - metered.sites_first)
                      / max(t_end - metered.t_first, 1e-9)
                      if metered.t_first is not None else 0.0)
            shutil.rmtree(f5dir, ignore_errors=True)
            return caller, n_calls, dt, steady

        caller, n_calls, dt_cold, _ = one_run("cold")
        # >=3 warm repeats on distinct fixed corpora: the 2-core bench host
        # shows ~1.5x run-to-run spread (featurize workers, main process and
        # the tunnel all contend), so min/median/max go in the artifact
        repeats = []  # (rate, wall, calls, steady) per warm run
        for rep in range(1 if tiny else WARM_REPEATS):
            tag = "warm" if rep == 0 else f"warm{rep + 1}"
            _, n_calls_w, dt_warm, steady = one_run(tag, caller)
            repeats.append((n_reads / dt_warm, dt_warm, n_calls_w, steady))
        # ALL reported warm numbers come from the single median-rate run,
        # so every field describes one actual run (rate/wall/sites/steady
        # stay consistent); the spread is in warm_repeats
        repeats.sort(key=lambda r: r[0])
        rate, wall, calls, steady = repeats[len(repeats) // 2]
        return {"reads_per_s_cold": round(n_reads / dt_cold, 2),
                "reads_per_s_warm": round(rate, 2),  # median of repeats
                "warm_repeats": {
                    "n": len(repeats),
                    "min": round(repeats[0][0], 2),
                    "median": round(rate, 2),
                    "max": round(repeats[-1][0], 2)},
                "sites_per_s_warm": round(calls / wall),
                "steady_state_sites_per_s": round(steady),
                "wall_s_cold": round(dt_cold, 2),
                "wall_s_warm": round(wall, 2),
                "reads": n_reads, "sites": calls}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


class _NoopDeviceCaller:
    """ModCaller stand-in whose device step is a host no-op: dispatch pads
    exactly like production but fabricates the (act, pred) outputs on the
    host, so an e2e run through it measures the FEATURIZE + DRAIN + WRITE
    ceiling of this host with the chip removed (VERDICT r4 #1b).  Collect
    and formatting reuse the production ModCaller code paths."""

    def __init__(self, batch_size: int = 4096):
        self.batch_size = batch_size

    # NOTE: all deepsignal_tpu.runtime.caller access is lazy (inside
    # methods).  A module-level (or class-body) import would make
    # ``import bench`` pull in jax — and every forkserver WORKER re-imports
    # __main__ (= this file under the driver), which turned ~20 ms worker
    # starts into ~2 s and silently slowed every host-side bench row ~9x.

    def dispatch_feature_batch(self, fb):
        from deepsignal_tpu.runtime.caller import _pad
        n = len(fb)
        bs = self.batch_size
        pending = []
        for i in range(0, n, bs):
            j = min(i + bs, n)
            # mirror the production host work minus the device: pad + pack
            for arr in (fb.kmers[i:j], fb.means[i:j], fb.stds[i:j],
                        fb.lens[i:j].astype(np.float32), fb.signals[i:j]):
                _pad(arr, bs)
            act = np.full((bs, 2), 0.5, np.float32)
            act[:, 1] += 1e-3
            pending.append((i, j, (act, np.ones(bs, np.int64))))
        return fb, pending

    def _resolve(self, handle):
        from deepsignal_tpu.runtime.caller import ModCaller
        return ModCaller._resolve(self, handle)

    def collect(self, handle, is_dna: bool = True):
        from deepsignal_tpu.runtime.caller import ModCaller
        return ModCaller.collect(self, handle, is_dna=is_dna)

    def collect_block(self, handle, is_dna: bool = True):
        from deepsignal_tpu.runtime.caller import ModCaller
        return ModCaller.collect_block(self, handle, is_dna=is_dna)


def measure_e2e_host_ceiling(n_reads=None) -> dict:
    """fast5 dir -> streaming featurize -> NO-OP device step -> TSV.

    Separating measurement: with the device step free, the wall clock is
    the host's own ceiling (featurize workers + batching + drain
    formatting + write).  Comparing against the real e2e run tells whether
    the binding resource is host CPU or the device+wire path."""
    from deepsignal_tpu.core.config import FeatureConfig
    from deepsignal_tpu.runtime.caller import call_mods_on_batches
    from deepsignal_tpu.runtime.pipeline import stream_fast5_feature_batches

    tiny = os.environ.get("BENCH_TINY") == "1"
    if n_reads is None:
        n_reads = 6 if tiny else N_READS_E2E
    tmp = tempfile.mkdtemp(prefix="bench_hostceil_")
    try:
        f5dir = os.path.join(tmp, "f5")
        os.makedirs(f5dir)
        n_sites = _write_synthetic_reads(f5dir, n_reads=n_reads,
                                         seed=TAG_SEEDS["hostceil"])
        out_tsv = os.path.join(tmp, "calls.tsv")
        caller = _NoopDeviceCaller(batch_size=4096)
        t0 = time.perf_counter()
        metered = _MeteredBatches(stream_fast5_feature_batches(
            f5dir, FeatureConfig(), nproc=3, f5_batch_num=25))
        n_calls = call_mods_on_batches(caller, metered, out_tsv)
        t_end = time.perf_counter()
        dt = t_end - t0
        assert n_calls >= 0.9 * n_sites, (n_calls, n_sites)
        steady = ((metered.sites - metered.sites_first)
                  / max(t_end - metered.t_first, 1e-9)
                  if metered.t_first is not None else 0.0)
        return {"reads_per_s": round(n_reads / dt, 2),
                "sites_per_s": round(n_calls / dt),
                "steady_state_sites_per_s": round(steady),
                "wall_s": round(dt, 2), "reads": n_reads}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def measure_e2e_file_mode(compute_dtype="bfloat16", n_reads=None) -> dict:
    """Pre-extracted feature TSV -> jit call -> calls TSV (file-input mode,
    call_modifications.py:450-491 analogue).

    Separating measurement: featurization is prepaid, so the run isolates
    the DEVICE + WIRE + DRAIN path (reader process + h2d + compute + d2h +
    formatting).  Together with the host-ceiling row it brackets where the
    real e2e pipeline binds."""
    from deepsignal_tpu.core.config import FeatureConfig, ModelConfig
    from deepsignal_tpu.models.deepsignal import init_model
    from deepsignal_tpu.runtime.caller import ModCaller, call_mods_on_batches
    from deepsignal_tpu.runtime.pipeline import (run_extract,
                                                 stream_file_feature_batches)
    from deepsignal_tpu.train.checkpoints import save_checkpoint, \
        load_checkpoint

    tiny = os.environ.get("BENCH_TINY") == "1"
    if n_reads is None:
        n_reads = 6 if tiny else N_READS_E2E
    cfg = (ModelConfig(lstm_hidden=128, inception_times=2,
                       inception_blocks=(1, 1, 1)) if tiny else ModelConfig())
    if compute_dtype == "bfloat16":
        cfg = ModelConfig(**{**cfg.__dict__, "compute_dtype": "bfloat16",
                             "matmul_precision": "default"})
    tmp = tempfile.mkdtemp(prefix="bench_filemode_")
    try:
        f5dir = os.path.join(tmp, "f5")
        os.makedirs(f5dir)
        _write_synthetic_reads(f5dir, n_reads=n_reads,
                               seed=TAG_SEEDS["filemode"])
        feats = os.path.join(tmp, "features.tsv")
        run_extract(f5dir, feats, FeatureConfig(), nproc=3, f5_batch_num=25)
        n_rows = sum(1 for _ in open(feats))

        model, variables = init_model(cfg, batch_size=8)
        ckpt = os.path.join(tmp, "model.ckpt")
        save_checkpoint(ckpt, cfg, variables)
        ld_cfg, ld_vars = load_checkpoint(ckpt)
        caller = ModCaller(ld_cfg, ld_vars, batch_size=4096)
        out_tsv = os.path.join(tmp, "calls.tsv")
        # warm the compile so the timed region is the steady pipeline
        caller.collect_block(caller.dispatch_feature_batch(
            next(iter(stream_file_feature_batches(feats, 50,
                                                  background=False)))))
        t0 = time.perf_counter()
        n_calls = call_mods_on_batches(
            caller, stream_file_feature_batches(feats, 50), out_tsv)
        dt = time.perf_counter() - t0
        assert n_calls == n_rows, (n_calls, n_rows)
        return {"sites_per_s": round(n_calls / dt),
                "reads_per_s": round(n_reads / dt, 2),
                "wall_s": round(dt, 2), "sites": n_calls,
                "compute_dtype": compute_dtype}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def measure_featurize_scaling(nprocs=(1, 2, 4), n_reads=192) -> dict:
    """Host featurization rate at several worker counts (the chip-feeding
    capacity of this host), measured through the production streaming
    pipeline.  Steady-state: timed from the first yielded batch so worker
    spawn/import (~1-2 s) does not distort the rate.  Note the bench host
    has only `os.cpu_count()` cores — rates beyond that are oversubscribed
    and reported for completeness."""
    from deepsignal_tpu.core.config import FeatureConfig
    from deepsignal_tpu.runtime.pipeline import stream_fast5_feature_batches

    tiny = os.environ.get("BENCH_TINY") == "1"
    if tiny:
        nprocs, n_reads = (1,), 6
    tmp = tempfile.mkdtemp(prefix="bench_feat_")
    try:
        _write_synthetic_reads(tmp, n_reads=n_reads)
        out = {"cores": os.cpu_count()}
        for np_ in nprocs:
            metered = _MeteredBatches(stream_fast5_feature_batches(
                tmp, FeatureConfig(), nproc=np_ + 1, f5_batch_num=8))
            for _ in metered:
                pass
            t_end = time.perf_counter()
            steady = ((metered.sites - metered.sites_first)
                      / max(t_end - metered.t_first, 1e-9)
                      if metered.t_first is not None else 0.0)
            out[f"sites_per_s_{np_}proc"] = round(steady)
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _build_torch_refnet():
    """torch-CPU stand-in for the TF1-CPU reference: same tensor shapes and
    layer inventory (embedding 1024x128, 3-layer bidirectional LSTM h=256,
    stem convs + 11 five-branch inception blocks at 240 ch, 6032x6032 joint
    head, no activation between the two joint FC layers — layers.py:256-263)."""
    import torch
    import torch.nn as nn

    torch.set_num_threads(os.cpu_count() or 2)

    class IncBlock(nn.Module):
        def __init__(self, cin, t=16):
            super().__init__()
            self.b1 = nn.Sequential(nn.MaxPool1d(3, 1, 1),
                                    nn.Conv1d(cin, t * 3, 1, bias=False),
                                    nn.BatchNorm1d(t * 3), nn.ReLU())
            self.b2 = nn.Sequential(nn.Conv1d(cin, t * 3, 1, bias=False),
                                    nn.BatchNorm1d(t * 3), nn.ReLU())
            self.b3 = nn.Sequential(nn.Conv1d(cin, t * 2, 1, bias=False),
                                    nn.BatchNorm1d(t * 2), nn.ReLU(),
                                    nn.Conv1d(t * 2, t * 3, 3, 1, 1,
                                              bias=False),
                                    nn.BatchNorm1d(t * 3), nn.ReLU())
            self.b4 = nn.Sequential(nn.Conv1d(cin, t * 2, 1, bias=False),
                                    nn.BatchNorm1d(t * 2), nn.ReLU(),
                                    nn.Conv1d(t * 2, t * 3, 5, 1, 2,
                                              bias=False),
                                    nn.BatchNorm1d(t * 3), nn.ReLU())
            self.stem = nn.Sequential(nn.Conv1d(cin, t * 3, 1, bias=False),
                                      nn.BatchNorm1d(t * 3))
            self.b5 = nn.Sequential(nn.Conv1d(cin, t * 2, 1, bias=False),
                                    nn.BatchNorm1d(t * 2), nn.ReLU(),
                                    nn.Conv1d(t * 2, t * 4, 3, 1, 1,
                                              bias=False),
                                    nn.BatchNorm1d(t * 4), nn.ReLU(),
                                    nn.Conv1d(t * 4, t * 3, 1, bias=False),
                                    nn.BatchNorm1d(t * 3))

        def forward(self, x):
            return torch.cat([self.b1(x), self.b2(x), self.b3(x),
                              self.b4(x),
                              torch.relu(self.stem(x) + self.b5(x))], dim=1)

    class RefNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.emb = nn.Embedding(1024, 128)
            self.lstm = nn.LSTM(131, 256, num_layers=3, batch_first=True,
                                bidirectional=True)
            self.stem = nn.Sequential(
                nn.Conv1d(1, 64, 7, 2, 3, bias=False), nn.BatchNorm1d(64),
                nn.ReLU(), nn.MaxPool1d(3, 2, 1),
                nn.Conv1d(64, 128, 1, bias=False), nn.BatchNorm1d(128),
                nn.ReLU(),
                nn.Conv1d(128, 256, 3, 1, 1, bias=False),
                nn.BatchNorm1d(256), nn.ReLU())
            blocks = []
            cin = 256
            for n in (3, 5, 3):
                for _ in range(n):
                    blocks.append(IncBlock(cin))
                    cin = 240
                blocks.append(nn.MaxPool1d(3, 2, 1))
            blocks.pop()  # no pool after last stage
            self.blocks = nn.Sequential(*blocks)
            self.avg = nn.AvgPool1d(7, 1, 3, count_include_pad=False)
            self.fc1 = nn.Linear(512 + 23 * 240, 512 + 23 * 240, bias=False)
            self.fc2 = nn.Linear(512 + 23 * 240, 2, bias=False)

        def forward(self, kmer, means, stds, sanums, signals):
            e = torch.cat([self.emb(kmer), means[..., None],
                           stds[..., None], sanums[..., None]], dim=2)
            out, _ = self.lstm(e)
            event = torch.cat([out[:, -1, :256], out[:, 0, 256:]], dim=1)
            sig = self.avg(self.blocks(self.stem(signals[:, None, :])))
            joint = torch.cat([event, sig.flatten(1)], dim=1)
            # Joint_model: FC -> dropout -> FC (no inter-layer activation,
            # reference layers.py:256-263); dropout is a no-op at inference.
            return self.fc2(self.fc1(joint))

    return RefNet()


def _torch_batch_args(rng, b):
    import torch
    d = _make_batch(rng, b)
    return (torch.from_numpy(d["kmer"]).long(),
            torch.from_numpy(d["means"]), torch.from_numpy(d["stds"]),
            torch.from_numpy(d["sanums"]), torch.from_numpy(d["signals"]))


def measure_extract(n_reads=128, nproc=3) -> dict:
    """``extract`` subcommand rate: fast5 dir -> 12-column feature TSV
    (reference workload extract_features.py:424-478), via the production
    ``run_extract`` driver (workers + writer process)."""
    from deepsignal_tpu.core.config import FeatureConfig
    from deepsignal_tpu.runtime.pipeline import run_extract

    tiny = os.environ.get("BENCH_TINY") == "1"
    if tiny:
        n_reads = 6
    tmp = tempfile.mkdtemp(prefix="bench_ext_")
    try:
        f5 = os.path.join(tmp, "f5")
        os.makedirs(f5)
        _write_synthetic_reads(f5, n_reads=n_reads, seed=77)
        out = os.path.join(tmp, "features.tsv")
        t0 = time.perf_counter()
        errors = run_extract(f5, out, FeatureConfig(), nproc=nproc,
                             f5_batch_num=16)
        dt = time.perf_counter() - t0
        n_rows = sum(1 for _ in open(out))
        assert errors == 0 and n_rows > 0
        return {"sites_per_s": round(n_rows / dt),
                "reads_per_s": round(n_reads / dt, 1),
                "wall_s": round(dt, 2), "nproc": nproc, "rows": n_rows}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _write_binary_features(path: str, n_rows: int, seed: int = 9,
                           k: int = 17, s: int = 360) -> None:
    """Synthetic binary feature records (tf_utils.py:7-28 layout)."""
    from deepsignal_tpu.io.feature_codec import binary_record_dtype
    rng = np.random.default_rng(seed)
    rec = np.zeros(n_rows, dtype=binary_record_dtype(k, s))
    rec["bases"] = rng.integers(0, 4, (n_rows, k))
    rec["means"] = rng.normal(0, 1, (n_rows, k)).astype(np.float32)
    rec["stds"] = np.abs(rng.normal(0, 1, (n_rows, k))).astype(np.float32)
    rec["lens"] = rng.integers(1, 40, (n_rows, k))
    rec["signals"] = rng.normal(0, 1, (n_rows, s)).astype(np.float32)
    rec["label"] = rng.integers(0, 2, n_rows)
    rec.tofile(path)


def measure_train_e2e(batch=TRAIN_BATCH_TPU, steps_small=8,
                      steps_large=40) -> dict:
    """PRODUCTION train() driver rate at the TPU-tuned bf16 config — the
    end-to-end counterpart of the serial-chained ``train_bf16_tuned`` row
    (binary dataset -> prefetch thread gathers AND device-stages batches ->
    jitted step -> deferred metric consumption).

    Protocol: one warm-up epoch compiles the step, then two timed epochs of
    different lengths with the SAME Trainer; the per-step cost is the
    SLOPE (wall_large - wall_small) / (steps_large - steps_small), which
    cancels the per-epoch constant (the epoch-final validation sweep),
    reported as per_epoch_overhead_s.  The rolling full-train-state save
    is disabled for the timed epochs (save_state=False): its ~0.5 GB d2h
    fetch is a per-epoch constant with +-20 s variance on a slow link,
    which would swamp the 32-step signal the slope measures (a negative
    slope was observed with it on).  Target: slope ms/step ~= the pure
    chained step (VERDICT r4 #5 done-criterion)."""
    import dataclasses

    from deepsignal_tpu.core.config import ModelConfig, TrainConfig
    from deepsignal_tpu.train.trainer import Trainer, train

    tiny = os.environ.get("BENCH_TINY") == "1"
    if tiny:
        batch, steps_small, steps_large = 64, 2, 4
    mcfg = ModelConfig(compute_dtype="bfloat16", matmul_precision="default",
                       **(dict(lstm_hidden=128, inception_times=2,
                               inception_blocks=(1, 1, 1)) if tiny else {}))
    tcfg = TrainConfig(batch_size=batch, max_epoch_num=1, min_epoch_num=1,
                       display_step=10**9, seed=0, save_state=False)
    tmp = tempfile.mkdtemp(prefix="bench_traine2e_")
    try:
        small_bin = os.path.join(tmp, "small.bin")
        large_bin = os.path.join(tmp, "large.bin")
        valid_bin = os.path.join(tmp, "valid.bin")
        warm_bin = os.path.join(tmp, "warm.bin")
        _write_binary_features(small_bin, batch * steps_small)
        _write_binary_features(large_bin, batch * steps_large, seed=12)
        _write_binary_features(valid_bin, batch, seed=10)
        _write_binary_features(warm_bin, batch, seed=11)

        trainer = Trainer(mcfg, tcfg)
        train(warm_bin, valid_bin, os.path.join(tmp, "m0"), None, mcfg,
              tcfg, is_binary=True, trainer=trainer)  # compile warm-up

        def timed(path, seed):
            t0 = time.perf_counter()
            train(path, valid_bin, os.path.join(tmp, f"m{seed}"), None,
                  mcfg, dataclasses.replace(tcfg, seed=seed),
                  is_binary=True, trainer=trainer)
            return time.perf_counter() - t0

        wall_small = timed(small_bin, 1)
        wall_large = timed(large_bin, 2)
        dsteps = steps_large - steps_small
        ms_step = (wall_large - wall_small) / dsteps * 1e3
        overhead = wall_small - steps_small * ms_step / 1e3
        return {"batch": batch,
                "steps": [steps_small, steps_large],
                "ms_per_step_e2e": round(ms_step, 2),
                "sites_per_s_e2e": (round(batch / ms_step * 1e3)
                                    if ms_step > 0 else None),
                "per_epoch_overhead_s": round(overhead, 2),
                "wall_s": [round(wall_small, 2), round(wall_large, 2)],
                "valid": bool(ms_step > 0),
                "note": "slope over two epoch lengths (state save off); "
                        "overhead = validation sweep"}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _write_feature_tsv(path: str, n_rows: int, seed: int = 5,
                       k: int = 17, s: int = 360) -> None:
    """Synthetic 12-column feature TSV (labels half 1 / half 0)."""
    rng = np.random.default_rng(seed)
    bases = np.array(list("ACGT"))
    zeros = ",".join(["0.0"] * s)
    with open(path, "w") as wf:
        for i in range(n_rows):
            kmer = "".join(bases[rng.integers(0, 4, k)])
            means = ",".join(str(x) for x in
                             np.around(rng.normal(0, 1, k), 6))
            stds = ",".join(str(x) for x in
                            np.around(np.abs(rng.normal(0, 1, k)), 6))
            lens = ",".join(str(int(x)) for x in rng.integers(1, 40, k))
            wf.write("\t".join(
                ["chr1", str(i), "+", str(i), f"read{i // 64}", "t", kmer,
                 means, stds, lens, zeros, str(i % 2)]) + "\n")


def measure_denoise(n_rows=6144) -> dict:
    """Denoise-loop bench — the one reference workload with no measured
    number (denoise.py:305-345).

    Protocol: RNN-only model (the reference's denoise default,
    deepsignal.py:400-418), synthetic corpus, epoch_num=1.  Two directly
    timed ``train_1time`` calls separate the Trainer-rebuild cost from the
    steady step rate: the denoise loop builds a FRESH Trainer (fresh jit)
    per call, so the first call pays the full compile and the second hits
    the in-process XLA compile cache — their difference is the re-jit
    overhead each denoise round amortizes.  Then one full ``denoise``
    iteration (rounds=2 -> 4 Trainer rebuilds + clean/select/concat) is
    timed end-to-end with the cache already warm."""
    from deepsignal_tpu.core.config import DenoiseConfig, ModelConfig
    from deepsignal_tpu.tools.dataset import random_select_file_rows_s
    from deepsignal_tpu.train.denoise import denoise, train_1time

    tiny = os.environ.get("BENCH_TINY") == "1"
    if tiny:
        n_rows = 256
    tmp = tempfile.mkdtemp(prefix="bench_denoise_")
    try:
        train_file = os.path.join(tmp, "train.tsv")
        _write_feature_tsv(train_file, n_rows)
        dcfg = DenoiseConfig(iterations=1, rounds=2, epoch_num=1,
                             step_interval=4)
        mcfg = ModelConfig(is_cnn=dcfg.is_cnn, is_rnn=dcfg.is_rnn,
                           is_base=dcfg.is_base, pos_weight=dcfg.pos_weight)
        if tiny:
            mcfg = ModelConfig(**{**mcfg.__dict__, "lstm_hidden": 16})

        f1 = os.path.join(tmp, "half1.tsv")
        f2 = os.path.join(tmp, "half2.tsv")
        lidxs1, lidxs2 = random_select_file_rows_s(train_file, f1, f2,
                                                   n_rows // 2, False)
        t0 = time.perf_counter()
        train_1time(f1, f2, lidxs2, mcfg, dcfg, seed=0)  # fresh jit
        t_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        train_1time(f2, f1, lidxs1, mcfg, dcfg, seed=1)  # compile cached
        t_warm = time.perf_counter() - t0
        # one train epoch + one scoring pass over half the corpus each
        n_steps = 2 * max(1, -(-(n_rows // 2) // dcfg.batch_size))

        t0 = time.perf_counter()
        out = denoise(train_file, model_cfg=mcfg, dcfg=dcfg, seed=2)
        t_iter = time.perf_counter() - t0
        assert os.path.exists(out)
        return {"rows": n_rows, "batch": dcfg.batch_size,
                "train_1time_cold_s": round(t_cold, 2),
                "train_1time_warm_s": round(t_warm, 2),
                "trainer_rebuild_overhead_s": round(t_cold - t_warm, 2),
                "ms_per_step_warm": round(t_warm / n_steps * 1e3, 1),
                "iteration_wall_s": round(t_iter, 2),
                "rounds_per_iteration": dcfg.rounds}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def measure_torch_cpu_sites_per_s(max_seconds: float = 240.0) -> float:
    import torch

    net = _build_torch_refnet().eval()
    rng = np.random.default_rng(0)
    args = _torch_batch_args(rng, BATCH)
    with torch.no_grad():
        net(*args)  # warmup
        done = 0
        t0 = time.time()
        while time.time() - t0 < max_seconds and done < 10:
            net(*args)
            done += 1
    return BATCH * done / (time.time() - t0)


def measure_torch_cpu_train_sites_per_s(max_seconds: float = 240.0) -> float:
    """CPU train-step baseline: forward + CE loss + backward + Adam on the
    reference architecture at batch 512 (train_model.py:144-161)."""
    import torch

    net = _build_torch_refnet().train()
    opt = torch.optim.Adam(net.parameters(), lr=1e-3)
    rng = np.random.default_rng(0)
    args = _torch_batch_args(rng, BATCH)
    labels = torch.from_numpy(rng.integers(0, 2, BATCH)).long()

    def one_step():
        opt.zero_grad(set_to_none=True)
        loss = torch.nn.functional.cross_entropy(net(*args), labels)
        loss.backward()
        opt.step()

    one_step()  # warmup
    done = 0
    t0 = time.time()
    while time.time() - t0 < max_seconds and done < 5:
        one_step()
        done += 1
    return BATCH * done / (time.time() - t0)


def get_baseline_sites_per_s() -> dict:
    """{'torch_cpu_sites_per_s': .., 'torch_cpu_train_sites_per_s': ..},
    measured once and cached (v3 adds the train-step baseline)."""
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cached = json.load(f)
            if cached.get("net_version") == 3:
                return cached
    cached = {"torch_cpu_sites_per_s": measure_torch_cpu_sites_per_s(),
              "torch_cpu_train_sites_per_s":
                  measure_torch_cpu_train_sites_per_s(),
              "net_version": 3,
              "note": "torch-CPU stand-in for TF1-CPU reference, "
                      f"batch {BATCH}, {os.cpu_count()} cores"}
    with open(BASELINE_CACHE, "w") as f:
        json.dump(cached, f)
    return cached


def main() -> int:
    from deepsignal_tpu.core.config import ModelConfig

    # BENCH_TINY=1: shrink the model so the harness itself can be smoke-
    # tested on CPU in seconds; never use for reported numbers.
    tiny = os.environ.get("BENCH_TINY") == "1"
    size = (dict(lstm_hidden=128, inception_times=2,
                 inception_blocks=(1, 1, 1)) if tiny else {})

    extras = {}
    extras["featurize"] = measure_featurize_scaling()
    extras["extract"] = measure_extract()

    cfg32 = ModelConfig(**size)
    cfg16 = ModelConfig(compute_dtype="bfloat16", matmul_precision="default",
                        **size)
    dev_batch = 64 if tiny else DEVICE_BATCH
    # shared device-resident variables: the joint head alone is ~145 MB and
    # re-uploading it per config through the tunnel dominates bench runtime
    variables = _init_device_variables(cfg32)

    # one FLOPs/site denominator for every full-model row, pinned to the
    # XLA-visible (lstm_impl="xla") compile so Pallas-opaque kernels cannot
    # weaken the MFU physics gate; the op inventory is identical across
    # lstm_impl and compute_dtype
    flops_ref = xla_flops_per_site(cfg32, dev_batch, variables=variables)

    # serial-chained chip rates (the physics-gated ground truth)
    f32 = measure_serial_model(cfg32, batch=dev_batch, wire="f32",
                               variables=variables,
                               flops_per_site=flops_ref)
    bf16 = measure_serial_model(cfg16, batch=dev_batch, wire="bf16",
                                variables=variables,
                                flops_per_site=flops_ref)
    f32_512 = measure_serial_model(cfg32, batch=(64 if tiny else BATCH),
                                   wire="f32", variables=variables,
                                   flops_per_site=flops_ref)
    extras["model_f32"] = f32
    extras["model_bf16"] = bf16
    extras["model_f32_b512"] = f32_512

    # production dispatch pattern (h2d included), capped by the serial rate
    extras["model_f32_h2d"] = measure_h2d_pipelined(
        cfg32, batch=dev_batch, wire="f32", variables=variables,
        serial_rate=f32["device_sites_per_s"])
    extras["model_bf16_h2d"] = measure_h2d_pipelined(
        cfg16, batch=dev_batch, wire="bf16", variables=variables,
        serial_rate=bf16["device_sites_per_s"])

    # training: serial-chained optimizer steps (reference train_model.py:
    # 144-161), physics-gated with the fwd+bwd+Adam XLA flops count
    train_batch = 64 if tiny else BATCH
    train_batch_tuned = 64 if tiny else TRAIN_BATCH_TPU
    train_flops = xla_train_flops_per_site(cfg32, train_batch)
    extras["train_f32"] = measure_serial_train(
        cfg32, batch=train_batch, flops_per_site=train_flops)
    extras["train_bf16"] = measure_serial_train(
        cfg16, batch=train_batch, flops_per_site=train_flops)
    extras["train_bf16_tuned"] = measure_serial_train(
        cfg16, batch=train_batch_tuned, flops_per_site=train_flops)
    # production train() driver at the same config: e2e ms/step should sit
    # on the pure chained step above (prefetch + deferred metric drain)
    extras["train_e2e"] = measure_train_e2e(batch=train_batch_tuned)

    # e2e on the SHIPPED default path (bfloat16, runtime/caller.py
    # DEFAULT_COMPUTE_DTYPE) — this is the headline (median of >=3 warm
    # repeats) — plus the f32 reference-parity mode as a secondary row
    extras["e2e"] = measure_e2e(compute_dtype="bfloat16")
    extras["e2e_f32"] = measure_e2e()
    # separating measurements (VERDICT r4 #1b): host ceiling (no-op device
    # step) vs device+wire ceiling (pre-extracted TSV input) bracket the
    # real e2e rate and name the binding resource on this host
    extras["e2e_host_ceiling"] = measure_e2e_host_ceiling()
    extras["e2e_file_mode"] = measure_e2e_file_mode()
    # the denoise loop (the one reference workload previously unmeasured)
    extras["denoise"] = measure_denoise()

    # chip-feeding requirement: featurize workers needed to saturate one chip
    feat1 = extras["featurize"].get("sites_per_s_1proc", 0)
    if feat1 and bf16["valid"]:
        extras["featurize"]["procs_to_saturate_chip_bf16"] = round(
            bf16["device_sites_per_s"] / feat1, 1)
    if feat1 and f32["valid"]:
        extras["featurize"]["procs_to_saturate_chip_f32"] = round(
            f32["device_sites_per_s"] / feat1, 1)

    baselines = get_baseline_sites_per_s()
    baseline = baselines["torch_cpu_sites_per_s"]
    train_base = baselines.get("torch_cpu_train_sites_per_s")
    if train_base:
        for key in ("train_f32", "train_bf16", "train_bf16_tuned"):
            extras[key]["vs_torch_cpu_train"] = round(
                extras[key]["sites_per_s"] / train_base, 2)
        extras["torch_cpu_train_sites_per_s"] = round(train_base)
    # primary: the measured end-to-end rate (fast5 -> calls TSV) on the
    # >=500-read corpus, warm.  On this 2-core bench host it is capped by
    # host featurization, NOT the chip — the model_* fields carry the
    # physics-gated chip-side rates and the featurize table shows the
    # workers-per-chip requirement on a production host.
    e2e = extras["e2e"]
    sites_per_s = e2e["sites_per_s_warm"]
    print(json.dumps({
        "metric": "call_mods_reads_per_s_e2e",
        "value": e2e["reads_per_s_warm"],
        "unit": "reads/s",
        "vs_baseline": round(sites_per_s / baseline, 2),
        "chip_peak_flops": _chip_peak(),
        **extras,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
