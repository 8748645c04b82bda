"""Real 2-process ``jax.distributed`` tests (CPU, gloo collectives).

The reference has no multi-node anything (SURVEY.md §2.3/§5.8); the TPU
framework's multi-host contract is:

- **inference**: embarrassingly parallel — each host runs a LOCAL mesh over
  its addressable devices on its stride shard of the fast5 list and writes
  ``<result>.part<k>-of-<n>`` (runtime/caller.py run_call_mods); the merged
  calls must equal a single-process run.
- **training**: one GLOBAL mesh; every host feeds its contiguous block of
  the global batch via ``jax.make_array_from_process_local_data``
  (parallel/mesh.py put_batch) and XLA psums gradients/metric counts, so all
  hosts make identical optimizer/early-stop decisions.

These tests launch 2 REAL processes (subprocess + jax.distributed.initialize
with 2 virtual CPU devices each -> a 4-device global mesh) and compare
against a single-process 4-device run in this test process.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = dict(lstm_hidden=8, lstm_layers=1, inception_times=1,
            inception_blocks=(1, 1, 1), cent_signals_len=24, kmer_len=5)
BATCH = 16
STEPS = 3
SEED = 7


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _make_fast5_dir(d, rng, n_reads=6):
    from deepsignal_tpu.io.fast5 import write_synthetic_fast5
    os.makedirs(d, exist_ok=True)
    for i in range(n_reads):
        n = 120
        seq = "".join(np.array(list("ACGT"))[rng.integers(0, 4, n)])
        lengths = rng.integers(3, 20, size=n)
        starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
        raw = rng.integers(400, 900,
                           size=int(lengths.sum()) + 5).astype(np.int16)
        write_synthetic_fast5(
            os.path.join(d, f"r{i}.fast5"), read_id=f"rid-{i}",
            raw_signal=raw, event_starts_rel=starts, event_lengths=lengths,
            seq=seq, mapped_chrom="chrI", mapped_start=1000 * i,
            mapped_strand="+" if i % 2 == 0 else "-")


def _make_binary_train_file(path, rng, n_rows=BATCH * STEPS):
    from deepsignal_tpu.io.feature_codec import binary_record_dtype
    dt = binary_record_dtype(TINY["kmer_len"], TINY["cent_signals_len"])
    rec = np.zeros(n_rows, dtype=dt)
    rec["bases"] = rng.integers(0, 4, (n_rows, TINY["kmer_len"]))
    rec["means"] = rng.normal(0, 1, (n_rows, TINY["kmer_len"]))
    rec["stds"] = np.abs(rng.normal(0, 1, (n_rows, TINY["kmer_len"])))
    rec["lens"] = rng.integers(1, 40, (n_rows, TINY["kmer_len"]))
    rec["signals"] = rng.normal(0, 1, (n_rows, TINY["cent_signals_len"]))
    rec["label"] = rng.integers(0, 2, n_rows)
    rec.tofile(path)


def _extract_features_tsv(f5_dir, tsv_path):
    """In-process extraction: fast5 dir -> 12-col feature TSV shared by all
    workers (file-mode input must be identical across hosts)."""
    from deepsignal_tpu.core.config import FeatureConfig
    from deepsignal_tpu.core.constants import get_motif_seqs
    from deepsignal_tpu.featurize.extractor import extract_fast5_batch
    from deepsignal_tpu.io.fast5 import get_fast5s
    fcfg = FeatureConfig(kmer_len=TINY["kmer_len"],
                         cent_signals_len=TINY["cent_signals_len"])
    feats, errs = extract_fast5_batch(sorted(get_fast5s(f5_dir)),
                                      get_motif_seqs("CG"), fcfg)
    assert errs == 0
    with open(tsv_path, "w") as wf:
        for fr in feats:
            for row in fr.to_tsv_rows():
                wf.write(row + "\n")


def _write_tiny_checkpoint(path):
    from deepsignal_tpu.core.config import ModelConfig
    from deepsignal_tpu.models.deepsignal import init_model
    from deepsignal_tpu.train.checkpoints import save_checkpoint
    import jax
    cfg = ModelConfig(**TINY)
    _, variables = init_model(cfg, jax.random.PRNGKey(SEED))
    save_checkpoint(path, cfg, variables)
    return cfg


def _train_steps(trainer, train_file):
    """The exact step sequence both the workers and the single-process
    reference run: STEPS sequential-order batches from the binary file."""
    from deepsignal_tpu.train.data import open_dataset
    ds = open_dataset(train_file, True, TINY["kmer_len"],
                      TINY["cent_signals_len"])
    out = []
    for i, batch in enumerate(ds.batches(BATCH)):
        loss, counts, _preds, _valid = trainer.train_on_batch(batch, 1e-3)
        out.append({"loss": loss, "counts": [int(c) for c in counts]})
        if i + 1 >= STEPS:
            break
    return out


def _params_checksum(params):
    import jax
    return float(sum(np.asarray(l, dtype=np.float64).sum()
                     for l in jax.tree.leaves(params)))


# ---------------------------------------------------------------------------
# Worker entry point: executed as ``python tests/test_multiprocess.py worker
# <pid> <port> <workdir>`` in a fresh process (2 virtual CPU devices).
# ---------------------------------------------------------------------------

def _worker_main(pid: int, port: int, workdir: str) -> None:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2 and jax.device_count() == 4

    from deepsignal_tpu.core.config import FeatureConfig, ModelConfig, \
        TrainConfig
    from deepsignal_tpu.parallel.mesh import make_mesh
    from deepsignal_tpu.runtime.caller import run_call_mods
    from deepsignal_tpu.train.trainer import Trainer

    # -- part A: sharded call_mods over the fast5 dir (local mesh per host,
    #    stride input shard, .part<k>-of-2 output shard)
    fcfg = FeatureConfig(kmer_len=TINY["kmer_len"],
                         cent_signals_len=TINY["cent_signals_len"])
    run_call_mods(os.path.join(workdir, "f5"),
                  os.path.join(workdir, "ckpt"),
                  os.path.join(workdir, "calls_mp.tsv"),
                  fcfg, batch_size=BATCH, nproc=2, f5_batch_num=2,
                  compute_dtype="float32")

    # -- part A2: sharded call_mods over a feature TSV (stride shard of the
    #    read-grouped batch stream; every host must NOT score the whole file)
    run_call_mods(os.path.join(workdir, "features.tsv"),
                  os.path.join(workdir, "ckpt"),
                  os.path.join(workdir, "calls_file_mp.tsv"),
                  fcfg, batch_size=BATCH, nproc=2, f5_batch_num=2,
                  compute_dtype="float32")

    # -- part B: global-mesh training steps (put_batch + psum'd counts)
    mesh = make_mesh()
    assert len(mesh.devices.flat) == 4
    trainer = Trainer(ModelConfig(**TINY), TrainConfig(batch_size=BATCH,
                                                       seed=SEED), mesh=mesh)
    steps = _train_steps(trainer, os.path.join(workdir, "train.bin"))
    with open(os.path.join(workdir, f"worker{pid}.json"), "w") as f:
        json.dump({"steps": steps,
                   "checksum": _params_checksum(trainer.params)}, f)


# ---------------------------------------------------------------------------
# The tests
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mp_run(tmp_path_factory):
    """Prepare shared inputs, run both workers, return the workdir."""
    rng = np.random.default_rng(SEED)
    workdir = str(tmp_path_factory.mktemp("mp"))
    _make_fast5_dir(os.path.join(workdir, "f5"), rng)
    _make_binary_train_file(os.path.join(workdir, "train.bin"), rng)
    _write_tiny_checkpoint(os.path.join(workdir, "ckpt"))
    _extract_features_tsv(os.path.join(workdir, "f5"),
                          os.path.join(workdir, "features.tsv"))

    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "worker", str(pid),
         str(port), workdir],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    return workdir


def test_two_process_call_mods_matches_single_process(mp_run, tmp_path):
    from deepsignal_tpu.core.config import FeatureConfig
    from deepsignal_tpu.parallel.dist import merge_call_shards
    from deepsignal_tpu.runtime.caller import run_call_mods

    merged = merge_call_shards(os.path.join(mp_run, "calls_mp.tsv"), 2)

    single = str(tmp_path / "calls_single.tsv")
    fcfg = FeatureConfig(kmer_len=TINY["kmer_len"],
                         cent_signals_len=TINY["cent_signals_len"])
    run_call_mods(os.path.join(mp_run, "f5"), os.path.join(mp_run, "ckpt"),
                  single, fcfg, batch_size=BATCH, nproc=2, f5_batch_num=2,
                  compute_dtype="float32")

    merged_lines = sorted(open(merged, "rb").read().splitlines())
    single_lines = sorted(open(single, "rb").read().splitlines())
    assert merged_lines, "no calls produced"
    assert len(merged_lines) == len(single_lines)
    # Binary calls and every non-prob field are byte-identical (read shards
    # only re-order reads across hosts).  Prob strings are float32-ulp-close:
    # the workers run 2-device local meshes while this process runs the
    # conftest's 8-device mesh, so per-device matmul shapes (and hence XLA's
    # reduction blocking) differ — last-ulp drift is expected and allowed.
    for got, want in zip(merged_lines, single_lines):
        g, w = got.split(b"\t"), want.split(b"\t")
        assert g[:6] == w[:6] and g[8:] == w[8:], (got, want)
        for gp, wp in zip(g[6:8], w[6:8]):
            assert float(gp) == pytest.approx(float(wp), abs=3e-7), \
                (got, want)


def test_two_process_file_mode_matches_single_process(mp_run, tmp_path):
    """Feature-TSV input: the merged 2-host shards equal one single-process
    run — no duplicated calls (each host scores only its stride shard of the
    read-grouped batch stream)."""
    from deepsignal_tpu.core.config import FeatureConfig
    from deepsignal_tpu.parallel.dist import merge_call_shards
    from deepsignal_tpu.runtime.caller import run_call_mods

    merged = merge_call_shards(os.path.join(mp_run, "calls_file_mp.tsv"), 2)

    single = str(tmp_path / "calls_file_single.tsv")
    fcfg = FeatureConfig(kmer_len=TINY["kmer_len"],
                         cent_signals_len=TINY["cent_signals_len"])
    run_call_mods(os.path.join(mp_run, "features.tsv"),
                  os.path.join(mp_run, "ckpt"), single, fcfg,
                  batch_size=BATCH, nproc=2, f5_batch_num=2,
                  compute_dtype="float32")

    merged_lines = sorted(open(merged, "rb").read().splitlines())
    single_lines = sorted(open(single, "rb").read().splitlines())
    assert merged_lines, "no calls produced"
    assert len(merged_lines) == len(single_lines)
    for got, want in zip(merged_lines, single_lines):
        g, w = got.split(b"\t"), want.split(b"\t")
        assert g[:6] == w[:6] and g[8:] == w[8:], (got, want)
        for gp, wp in zip(g[6:8], w[6:8]):
            assert float(gp) == pytest.approx(float(wp), abs=3e-7), \
                (got, want)


def test_two_process_train_step_matches_single_process(mp_run):
    import jax
    from deepsignal_tpu.core.config import ModelConfig, TrainConfig
    from deepsignal_tpu.parallel.mesh import make_mesh
    from deepsignal_tpu.train.trainer import Trainer

    w0 = json.load(open(os.path.join(mp_run, "worker0.json")))
    w1 = json.load(open(os.path.join(mp_run, "worker1.json")))
    # both hosts derive identical (replicated) losses/counts/params
    assert w0 == w1

    # single-process reference on a 4-device mesh of the same shape
    mesh = make_mesh(n_devices=4)
    trainer = Trainer(ModelConfig(**TINY), TrainConfig(batch_size=BATCH,
                                                       seed=SEED), mesh=mesh)
    ref = _train_steps(trainer, os.path.join(mp_run, "train.bin"))

    for got, want in zip(w0["steps"], ref):
        assert got["counts"] == want["counts"]  # exact integer counts
        assert got["loss"] == pytest.approx(want["loss"], rel=1e-5)
    assert w0["checksum"] == pytest.approx(_params_checksum(trainer.params),
                                           rel=1e-5)


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "worker":
        _worker_main(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
