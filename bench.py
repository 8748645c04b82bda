"""call_mods throughput benchmark.

Prints ONE JSON line:
  {"metric": "call_mods_reads_per_s_per_chip", "value": N, "unit": "reads/s",
   "vs_baseline": R}

- value: reads/s on one TPU chip for the flagship model's inference path
  (batch 512, full 17-mer/360-signal config), derived from measured sites/s
  with SITES_PER_READ = 100 (a yeast R9.4 read averages ~100 CpG sites:
  ~6 kb, CpG every ~60 bp).  Host->device transfer of each batch is included.
- vs_baseline: ratio vs a measured torch-CPU implementation of the same
  architecture (BiLSTM 3x256 bidirectional + inception-style conv stack +
  joint head).  The reference is TF1-CPU (no TF1 in this image); torch-CPU
  with MKL is the closest measurable stand-in for its performance class.
  The baseline number is cached in bench_baseline.json after first
  measurement.

Timing protocol: median of per-trial means over TRIALS trials of ITERS
batches each (the TPU tunnel on this host has high latency variance).
"""

import json
import os
import sys
import time

import numpy as np

SITES_PER_READ = 100
BATCH = 512
ITERS = 20
TRIALS = 5
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "bench_baseline.json")


def _make_batch(rng, b, k=17, s=360):
    return dict(
        kmer=rng.integers(0, 4, (b, k)).astype(np.int32),
        means=rng.normal(0, 1, (b, k)).astype(np.float32),
        stds=np.abs(rng.normal(0, 1, (b, k))).astype(np.float32),
        sanums=rng.integers(1, 40, (b, k)).astype(np.float32),
        signals=rng.normal(0, 1, (b, s)).astype(np.float32))


def measure_tpu_sites_per_s() -> float:
    import jax

    from deepsignal_tpu.core.config import ModelConfig
    from deepsignal_tpu.models.deepsignal import (init_model,
                                                  normalized_probs,
                                                  predictions)

    cfg = ModelConfig()
    model, variables = init_model(cfg, batch_size=8)
    # params must be chip-resident: passing host numpy re-uploads ~180 MB
    # through the tunnel on EVERY call (measured 3.2 s/batch vs 21 ms)
    variables = jax.device_put(variables)

    @jax.jit
    def fn(variables, b):
        logits = model.apply(variables, b["kmer"], b["means"], b["stds"],
                             b["sanums"], b["signals"], train=False)
        p0, p1 = normalized_probs(logits)
        return p0, p1, predictions(logits, 1.0)

    rng = np.random.default_rng(0)
    batch = _make_batch(rng, BATCH)
    out = fn(variables, batch)
    jax.block_until_ready(out)

    rates = []
    for _ in range(TRIALS):
        t = time.time()
        for _ in range(ITERS):
            out = fn(variables, batch)  # includes h2d of the numpy batch
        jax.block_until_ready(out)
        rates.append(BATCH * ITERS / (time.time() - t))
    return float(np.median(rates))


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
    sites_per_s = measure_tpu_sites_per_s()
    baseline = get_baseline_sites_per_s()
    reads_per_s = sites_per_s / SITES_PER_READ
    print(json.dumps({
        "metric": "call_mods_reads_per_s_per_chip",
        "value": round(reads_per_s, 2),
        "unit": "reads/s",
        "vs_baseline": round(sites_per_s / baseline, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
