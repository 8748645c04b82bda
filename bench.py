"""call_mods throughput benchmark.

Prints ONE JSON line:
  {"metric": "call_mods_reads_per_s_e2e", "value": N, "unit": "reads/s",
   "vs_baseline": R, ...extra fields...}

- value: measured END-TO-END call_mods rate — fast5 dir -> multiprocess
  featurize -> jit TPU inference -> 10-column call TSV — on a >=500-read
  synthetic corpus (6 kb reads, CpGs planted every 60 bases = yeast-like
  density), warm (model compiled; worker spawn included in the wall clock,
  and a separate steady_state rate excludes the startup ramp).
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
SERIAL_ITERS = 8
N_READS_E2E = 500      # e2e corpus size (reads); ~100 CpG sites per read
READ_LEN = 6000
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


def measure_serial_model(cfg, batch=DEVICE_BATCH, wire=None,
                         iters=SERIAL_ITERS, variables=None) -> dict:
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

    # flops of the exact compiled step (includes the negligible chain ops)
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
            "valid": valid}


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
    and jit compile (what a single short CLI run pays); ``warm`` = the same
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
                                                 seed=hash(tag) % (1 << 31))
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
        _, n_calls_w, dt_warm, steady = one_run("warm", caller)
        return {"reads_per_s_cold": round(n_reads / dt_cold, 2),
                "reads_per_s_warm": round(n_reads / dt_warm, 2),
                "sites_per_s_warm": round(n_calls_w / dt_warm),
                "steady_state_sites_per_s": round(steady),
                "wall_s_cold": round(dt_cold, 2),
                "wall_s_warm": round(dt_warm, 2),
                "reads": n_reads, "sites": n_calls_w}
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


def measure_torch_cpu_sites_per_s(max_seconds: float = 240.0) -> float:
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

    net = RefNet().eval()
    rng = np.random.default_rng(0)
    b = _make_batch(rng, BATCH)
    args = (torch.from_numpy(b["kmer"]).long(),
            torch.from_numpy(b["means"]), torch.from_numpy(b["stds"]),
            torch.from_numpy(b["sanums"]), torch.from_numpy(b["signals"]))
    with torch.no_grad():
        net(*args)  # warmup
        done = 0
        t0 = time.time()
        while time.time() - t0 < max_seconds and done < 10:
            net(*args)
            done += 1
    return BATCH * done / (time.time() - t0)


def get_baseline_sites_per_s() -> float:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cached = json.load(f)
            if cached.get("net_version") == 2:  # v2: no fc1 ReLU (parity)
                return cached["torch_cpu_sites_per_s"]
    rate = measure_torch_cpu_sites_per_s()
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"torch_cpu_sites_per_s": rate, "net_version": 2,
                   "note": "torch-CPU stand-in for TF1-CPU reference, "
                           f"batch {BATCH}, {os.cpu_count()} cores"}, f)
    return rate


def main() -> int:
    from deepsignal_tpu.core.config import ModelConfig

    # BENCH_TINY=1: shrink the model so the harness itself can be smoke-
    # tested on CPU in seconds; never use for reported numbers.
    tiny = os.environ.get("BENCH_TINY") == "1"
    size = (dict(lstm_hidden=128, inception_times=2,
                 inception_blocks=(1, 1, 1)) if tiny else {})

    extras = {}
    extras["featurize"] = measure_featurize_scaling()

    cfg32 = ModelConfig(**size)
    cfg16 = ModelConfig(compute_dtype="bfloat16", matmul_precision="default",
                        **size)
    dev_batch = 64 if tiny else DEVICE_BATCH
    # shared device-resident variables: the joint head alone is ~145 MB and
    # re-uploading it per config through the tunnel dominates bench runtime
    variables = _init_device_variables(cfg32)

    # serial-chained chip rates (the physics-gated ground truth)
    f32 = measure_serial_model(cfg32, batch=dev_batch, wire="f32",
                               variables=variables)
    bf16 = measure_serial_model(cfg16, batch=dev_batch, wire="bf16",
                                variables=variables)
    f32_512 = measure_serial_model(cfg32, batch=(64 if tiny else BATCH),
                                   wire="f32", variables=variables)
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

    extras["e2e"] = measure_e2e()
    extras["e2e_bf16"] = measure_e2e(compute_dtype="bfloat16")

    # chip-feeding requirement: featurize workers needed to saturate one chip
    feat1 = extras["featurize"].get("sites_per_s_1proc", 0)
    if feat1 and bf16["valid"]:
        extras["featurize"]["procs_to_saturate_chip_bf16"] = round(
            bf16["device_sites_per_s"] / feat1, 1)
    if feat1 and f32["valid"]:
        extras["featurize"]["procs_to_saturate_chip_f32"] = round(
            f32["device_sites_per_s"] / feat1, 1)

    baseline = get_baseline_sites_per_s()
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
