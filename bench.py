"""call_mods throughput benchmark.

Prints ONE JSON line:
  {"metric": "call_mods_reads_per_s_per_chip", "value": N, "unit": "reads/s",
   "vs_baseline": R, ...extra fields...}

- value: the chip-side call_mods rate: jitted fixed-shape inference
  including fresh host->device transfer of every batch (f32 parity path,
  matmul_precision=highest), converted to reads/s with the sites-per-read
  ratio MEASURED from the synthetic corpus (6 kb reads, CpG planted every
  60 bases = yeast-like density; nothing modeled).
- vs_baseline: the same sites/s vs a measured torch-CPU implementation of
  the same architecture doing model-only inference.  The reference is
  TF1-CPU (no TF1 in this image); torch-CPU with MKL is the closest
  measurable stand-in.  Cached in bench_baseline.json.
- extra fields decompose the whole pipeline: device-resident model rates
  for f32 and bf16, end-to-end runs (fast5 IO -> multiprocess featurize ->
  inference -> call TSV) both cold (incl. checkpoint load + jit compile)
  and warm, f32 and bf16, and the featurize-only rate.  On this 2-core
  bench host the end-to-end warm rate is capped by host featurization; the
  chip-side rate is the scaling-relevant number (a production host featurizes
  on many cores and/or many hosts feed one chip pool).

Measurement protocol: the bench host reaches its chip through a tunnel
whose backend MEMOIZES repeated (program, args) executions — every timed
call therefore sees unique batch content, and rates were cross-checked with
serially-chained calls that cannot overlap (scripts/profile_serial.py).

Timing: median over trials where cheap; single wall-clock pass for the
end-to-end run (it processes every synthetic read exactly once).
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
ITERS = 10
TRIALS = 3
N_READS = 48          # 6 kb reads -> ~100 CpG sites each -> ~4800 sites
READ_LEN = 6000
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "bench_baseline.json")


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


def _write_synthetic_reads(f5dir: str, n_reads: int = N_READS,
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


def _jit_infer(cfg):
    import jax
    import jax.numpy as jnp

    from deepsignal_tpu.models.deepsignal import DeepSignalNet, predictions

    model = DeepSignalNet(cfg)

    @jax.jit
    def fn(variables, b):
        logits = model.apply(variables, b["kmer"].astype(jnp.int32),
                             b["means"], b["stds"],
                             b["sanums"], b["signals"], train=False)
        return jax.nn.sigmoid(logits), predictions(logits, 1.0)
    return fn


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


def measure_model_rates(cfg, batch=BATCH, wire=None, iters=ITERS,
                        variables=None) -> dict:
    """Device-resident sites/s and fresh-h2d model-path ms/batch.

    Protocol: every timed call sees UNIQUE batch content — the tunnel
    backend memoizes repeated (program, args) executions, so cycling a small
    set of batches reports fantasy numbers.  Each trial generates its own
    fresh batches.  ``wire`` selects the production ModCaller wire format
    (int8 kmer / uint16 sanums, f32 or bf16 floats — tests/test_caller.py
    proves both are exact for their compute paths)."""
    import jax

    if variables is None:
        variables = _init_device_variables(cfg)
    fn = _jit_infer(cfg)

    rng = np.random.default_rng(0)
    out = fn(variables, jax.device_put(_make_batch(rng, batch, wire=wire)))
    jax.block_until_ready(out)

    # device-resident, unique content per call
    rates = []
    for _ in range(TRIALS):
        devs = [jax.device_put(_make_batch(rng, batch, wire=wire))
                for _ in range(iters)]
        jax.block_until_ready(devs)
        t = time.perf_counter()
        outs = [fn(variables, d) for d in devs]
        jax.block_until_ready(outs)
        rates.append(batch * iters / (time.perf_counter() - t))
    dev_rate = float(np.median(rates))

    # fresh-content h2d + compute, pipelined one batch ahead
    rates = []
    for _ in range(TRIALS):
        fresh = [_make_batch(rng, batch, wire=wire)
                 for _ in range(iters + 1)]
        t = time.perf_counter()
        outs = []
        d = jax.device_put(fresh[0])
        for i in range(iters):
            nxt = jax.device_put(fresh[i + 1])
            outs.append(fn(variables, d))
            d = nxt
        jax.block_until_ready(outs)
        rates.append(batch * iters / (time.perf_counter() - t))
    h2d_rate = float(np.median(rates))
    return {"batch": batch,
            "device_sites_per_s": round(dev_rate),
            "with_h2d_sites_per_s": round(h2d_rate),
            "ms_per_batch_with_h2d": round(batch / h2d_rate * 1e3, 2)}


def measure_e2e(compute_dtype=None) -> dict:
    """fast5 dir -> streaming featurize -> jit call -> TSV.

    Two numbers: ``cold`` = one-shot wall clock including checkpoint load,
    param upload, and jit compile (what a single short CLI run pays);
    ``warm`` = the same pipeline with the caller already compiled, on FRESH
    reads (what a long run converges to — compile amortizes away; fresh data
    because the tunnel memoizes repeated executions).  On this 2-core bench
    host the warm rate is capped by host featurization, not the chip — see
    the f32/bf16 model-path fields for the chip-side rate."""
    import jax

    from deepsignal_tpu.core.config import FeatureConfig, ModelConfig
    from deepsignal_tpu.models.deepsignal import init_model
    from deepsignal_tpu.runtime.caller import ModCaller, call_mods_on_batches
    from deepsignal_tpu.runtime.pipeline import stream_fast5_feature_batches
    from deepsignal_tpu.train.checkpoints import (load_checkpoint,
                                                  save_checkpoint)

    tiny = os.environ.get("BENCH_TINY") == "1"
    tmp = tempfile.mkdtemp(prefix="bench_e2e_")
    try:
        n_reads = 6 if tiny else N_READS
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
            batches = stream_fast5_feature_batches(
                f5dir, FeatureConfig(), nproc=3, f5_batch_num=8)
            n_calls = call_mods_on_batches(caller, batches, out_tsv)
            dt = time.perf_counter() - t0
            assert n_calls >= 0.9 * n_sites_exp, (n_calls, n_sites_exp)
            return caller, n_calls, dt

        caller, n_calls, dt_cold = one_run("cold")
        _, n_calls_w, dt_warm = one_run("warm", caller)
        return {"reads_per_s_cold": round(n_reads / dt_cold, 2),
                "reads_per_s_warm": round(n_reads / dt_warm, 2),
                "sites_per_s_warm": round(n_calls_w / dt_warm),
                "wall_s_cold": round(dt_cold, 2),
                "wall_s_warm": round(dt_warm, 2),
                "reads": n_reads, "sites": n_calls_w}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def measure_featurize_only() -> dict:
    from deepsignal_tpu.core.config import FeatureConfig
    from deepsignal_tpu.core.constants import get_motif_seqs
    from deepsignal_tpu.featurize.extractor import extract_fast5_batch
    from deepsignal_tpu.io.fast5 import get_fast5s

    tmp = tempfile.mkdtemp(prefix="bench_feat_")
    try:
        _write_synthetic_reads(tmp, n_reads=16)
        files = sorted(get_fast5s(tmp))
        motifs = get_motif_seqs("CG")
        t0 = time.perf_counter()
        feats, _ = extract_fast5_batch(files, motifs, FeatureConfig())
        dt = time.perf_counter() - t0
        sites = sum(len(f.kmers) for f in feats)
        return {"featurize_sites_per_s_1proc": round(sites / dt)}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def measure_torch_cpu_sites_per_s(max_seconds: float = 240.0) -> float:
    """torch-CPU stand-in for the TF1-CPU reference: same tensor shapes and
    layer inventory (embedding 1024x128, 3-layer bidirectional LSTM h=256,
    stem convs + 11 five-branch inception blocks at 240 ch, 6032x6032 joint
    head)."""
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
            return self.fc2(torch.relu(self.fc1(joint)))

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
            return json.load(f)["torch_cpu_sites_per_s"]
    rate = measure_torch_cpu_sites_per_s()
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"torch_cpu_sites_per_s": rate,
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
    extras.update(measure_featurize_only())

    cfg32 = ModelConfig(**size)
    cfg16 = ModelConfig(compute_dtype="bfloat16", matmul_precision="default",
                        **size)
    dev_batch = 64 if tiny else DEVICE_BATCH
    # shared device-resident variables: the joint head alone is ~145 MB and
    # re-uploading it per config through the tunnel dominates bench runtime
    variables = _init_device_variables(cfg32)
    # f32 parity path at the production wire format + TPU-tuned batch
    f32 = measure_model_rates(cfg32, batch=dev_batch, wire="f32", iters=4,
                              variables=variables)
    extras["f32"] = f32
    extras["bf16"] = measure_model_rates(cfg16, batch=dev_batch, wire="bf16",
                                         iters=4, variables=variables)
    # reference-parity batch size, for continuity with earlier rounds
    extras["f32_b512"] = measure_model_rates(cfg32, batch=(64 if tiny
                                                           else BATCH),
                                             wire="f32",
                                             variables=variables)

    extras["e2e"] = measure_e2e()
    extras["e2e_bf16"] = measure_e2e(compute_dtype="bfloat16")

    baseline = get_baseline_sites_per_s()
    # primary: the chip-side call_mods rate (model inference incl. fresh
    # host->device transfer, unique content every call, f32 parity path,
    # production wire format + TPU-tuned device batch) at ~100 CpG sites
    # per read.  The e2e fields give the whole-pipeline rate, which on this
    # 2-core bench host is capped by featurization, not the chip
    # (featurize_sites_per_s_1proc vs f32.with_h2d_sites_per_s).
    sites_per_s = f32["with_h2d_sites_per_s"]
    # sites-per-read measured from the synthetic corpus (not modeled)
    spr = extras["e2e"]["sites"] / extras["e2e"]["reads"]
    print(json.dumps({
        "metric": "call_mods_reads_per_s_per_chip",
        "value": round(sites_per_s / spr, 1),
        "unit": "reads/s",
        "vs_baseline": round(sites_per_s / baseline, 2),
        **extras,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
