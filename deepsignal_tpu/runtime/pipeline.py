"""Host-side streaming pipeline: multiprocess featurization + writers.

Re-design of the reference's process orchestration (SURVEY.md §2.3;
extract_features.py:306-478, call_modifications.py:300-495):

- ``run_extract``: worker-pool fan-out over fast5 batches -> TSV writer
  process (file or rotating dir files).
- ``stream_fast5_feature_batches``: worker pool featurizes fast5 batches and
  streams FeatureBatch structs to the caller — the TPU-mode analogue of the
  reference's "N-1 extractor procs feeding the one device-owning proc"
  (call_modifications.py:353-414); here the main process owns the jitted
  model on the TPU mesh.
- ``stream_file_feature_batches``: background reader process parsing the
  feature TSV into read-grouped FeatureBatches (call_modifications.py:35-91).

Clean-shutdown design: per-worker ``None`` sentinels on JoinableQueues
replace the reference's re-put "kill" strings + 1s polling + success-file
broadcast; no busy-waiting anywhere.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import queue as queue_mod
import threading
import time
from typing import Iterator, Optional

import numpy as np

from ..core.config import FeatureConfig
from ..core.constants import get_motif_seqs
from ..featurize.extractor import (extract_fast5_batch,
                                   read_features_to_batch,
                                   read_position_file)
from ..io.fasta import get_contig2len
from ..io.fast5 import get_fast5s
from ..io.feature_codec import FeatureBatch, iter_feature_batches_by_read

QUEUE_MAX_BATCHES = 100  # backpressure bound (vs reference's qsize polling)


_forkserver_claimed = False
# serializes the claim/probe below: two threads creating pipelines
# concurrently must not both probe-and-claim the process-wide forkserver
# (one could skip the spawn fallback it should have taken)
_forkserver_lock = threading.Lock()


def _worker_context():
    """Multiprocessing context for host-side workers.

    ``forkserver`` when available (Linux): the server process preloads the
    jax-free worker import tree once, and every later worker is a ~20 ms
    fork instead of a ~0.7 s fresh-interpreter import (measured; the spawn
    cost dominated short call_mods runs).  The server is first launched
    inside ``_host_worker_env``, so it — and every worker forked from it —
    carries the accelerator-free environment snapshotted at THAT first
    launch (all pipelines in a process want the same cleaned env; later
    operator env changes intentionally do not reach workers).

    The stdlib forkserver is a per-process singleton: if some OTHER
    component already started it, its env was not cleaned by
    ``_host_worker_env`` and workers forked from it could carry an
    initialized accelerator runtime — in that case (and wherever forkserver
    is unavailable) fall back to ``spawn``, whose children snapshot the env
    per ``Process.start``."""
    global _forkserver_claimed
    try:
        ctx = mp.get_context("forkserver")
    except ValueError:  # pragma: no cover - platform-dependent
        return mp.get_context("spawn")
    with _forkserver_lock:
        if not _forkserver_claimed:
            try:
                from multiprocessing import forkserver as _fs
                foreign = getattr(_fs._forkserver, "_forkserver_pid",
                                  None) is not None
            except Exception:  # pragma: no cover - stdlib-internal probe
                foreign = True
            if foreign:
                return mp.get_context("spawn")
            _forkserver_claimed = True
    # "__main__" restores the stdlib default (set_forkserver_preload
    # REPLACES it): without it every forked worker re-imports the driver
    # script itself, so a driver with heavy module-level imports taxes
    # EVERY worker start (measured: a __main__ that imports jax turned
    # ~20 ms forks into ~2 s and run_extract 9x slower).  Pre-importing it
    # once in the server (under the cleaned env, guarded run_name) makes
    # worker starts immune to the driver's import weight.
    ctx.set_forkserver_preload(["__main__",
                                "deepsignal_tpu.featurize.extractor",
                                "deepsignal_tpu.io.fast5",
                                "deepsignal_tpu.io.feature_codec"])
    return ctx


class _host_worker_env:
    """Start host-side workers with an accelerator-free interpreter.

    Featurize/IO workers are pure numpy/h5py — they must not pay the
    accelerator-plugin bootstrap (a ``sitecustomize.py`` on PYTHONPATH that
    imports jax + registers a TPU backend costs seconds per spawned worker
    and may dial the device transport).  Inside this context:

    1. The env gates the known accelerator hook keys on (``_ACCEL_ENV_GATES``)
       are unset — the hook itself is a no-op without them, making the
       opt-out robust regardless of where the hook file lives.
    2. As fallback for unknown hooks, PYTHONPATH entries whose
       ``sitecustomize.py`` looks like an accelerator bootstrap are dropped.
    3. ``JAX_PLATFORMS=cpu`` is pinned so an accidental jax import in a
       worker can never touch the TPU.

    The parent env is restored on exit (spawned children snapshot the env at
    ``Process.start``).  The mutation of process-global ``os.environ`` is
    serialized by a module lock so two pipelines spawning concurrently (e.g.
    from threads) cannot observe each other's half-modified env."""

    _lock = threading.Lock()

    # The baked axon site hook begins with ``if os.environ.get(
    # "PALLAS_AXON_POOL_IPS"):`` — without the gate it does nothing, so
    # unsetting it is the sanctioned opt-out (no file sniffing needed for
    # the known hook).  Deployments whose hook keys on a different env var
    # can extend the list via DEEPSIGNAL_TPU_ACCEL_ENV_GATES
    # (comma-separated names).
    _ACCEL_ENV_GATES = ("PALLAS_AXON_POOL_IPS",)

    @classmethod
    def _gates(cls):
        extra = os.environ.get("DEEPSIGNAL_TPU_ACCEL_ENV_GATES", "")
        return cls._ACCEL_ENV_GATES + tuple(
            g for g in (x.strip() for x in extra.split(",")) if g)

    @staticmethod
    def _is_accel_hook(entry: str) -> bool:
        """Fallback classifier for UNKNOWN hooks: True for PYTHONPATH
        entries whose sitecustomize.py is an accelerator-plugin bootstrap
        (imports jax / registers a backend).  A sitecustomize that merely
        tweaks paths must survive, as must empty entries (= cwd) and
        entries with no sitecustomize at all; a sitecustomize that EXISTS
        but cannot be read is dropped (cannot prove it harmless)."""
        if not entry:
            return False
        sc = os.path.join(entry, "sitecustomize.py")
        if not os.path.exists(sc):
            return False
        try:
            with open(sc, "r", errors="replace") as f:
                text = f.read()
        except OSError:
            return True
        import re
        return bool(re.search(r"(?m)^\s*(?:import|from)\s+jax\b", text)
                    or "axon" in text
                    or ("register" in text and "PJRT" in text))

    def __enter__(self):
        self._lock.acquire()
        gates = self._gates()
        self._saved = {k: os.environ.get(k)
                       for k in (("PYTHONPATH", "JAX_PLATFORMS") + gates)}
        for k in gates:
            os.environ.pop(k, None)
        entries = os.environ.get("PYTHONPATH", "").split(os.pathsep)
        keep = [e for e in entries if not self._is_accel_hook(e)]
        os.environ["PYTHONPATH"] = os.pathsep.join(keep)
        os.environ["JAX_PLATFORMS"] = "cpu"
        return self

    def __exit__(self, *exc):
        for k, v in self._saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        self._lock.release()
        return False


def _extract_worker(fast5s_q, out_q, errornum_q, cfg: FeatureConfig,
                    motif_seqs, chrom2len, positions, as_batch: bool,
                    worker_id: int = 0):
    """Worker loop: fast5 path batches -> TSV rows or FeatureBatch.

    Streaming mode (``as_batch``) speaks a typed protocol on ``out_q`` —
    ``("fb", batch_or_None, n_errors)`` per input batch and a final
    ``("done", worker_id, n_processed)`` sentinel — so the consumer can
    account for every submitted batch deterministically (no ``qsize``/
    ``empty()`` polling, which mp queues document as unreliable)."""
    # rng=None: extract_read_features derives a per-read RNG from
    # cfg.central_sample_seed, so output is deterministic across worker
    # counts and queue orders
    processed = 0
    while True:
        item = fast5s_q.get()
        if item is None:
            fast5s_q.task_done()
            break
        feats_list, errors = extract_fast5_batch(item, motif_seqs, cfg,
                                                 chrom2len, positions)
        if as_batch:
            fb = read_features_to_batch(feats_list)
            out_q.put(("fb", fb, errors))
        else:
            errornum_q.put(errors)
            rows = [r for f in feats_list for r in f.to_tsv_rows()]
            out_q.put(rows)
        processed += 1
        fast5s_q.task_done()
    if as_batch:
        out_q.put(("done", worker_id, processed))


def _write_rows_file(write_fp: str, rows_q):
    with open(write_fp, "w") as wf:
        while True:
            rows = rows_q.get()
            if rows is None:
                break
            for r in rows:
                wf.write(r + "\n")
            wf.flush()


def _write_rows_dir(write_dir: str, rows_q, w_batch_num: int):
    """Rotating output files, w_batch_num row-batches per file
    (extract_features.py:351-378)."""
    if os.path.exists(write_dir):
        if os.path.isfile(write_dir):
            raise FileExistsError(
                f"{write_dir} already exists as a file, please use another "
                "write_dir")
    else:
        os.makedirs(write_dir)
    file_count = 0
    batch_count = 0
    wf = open(os.path.join(write_dir, f"{file_count}.tsv"), "w")
    try:
        while True:
            rows = rows_q.get()
            if rows is None:
                break
            if batch_count >= w_batch_num:
                wf.flush()
                wf.close()
                file_count += 1
                wf = open(os.path.join(write_dir, f"{file_count}.tsv"), "w")
                batch_count = 0
            for r in rows:
                wf.write(r + "\n")
            batch_count += 1
    finally:
        wf.close()


def _preprocess(fast5_dir: str, cfg: FeatureConfig, reference_path,
                position_file, is_recursive: bool, host_shard=None):
    fast5_files = get_fast5s(fast5_dir, is_recursive)
    if host_shard is not None and host_shard[1] > 1:
        from ..parallel.dist import shard_file_list
        fast5_files = shard_file_list(fast5_files, host_shard[0],
                                      host_shard[1])
        print("host {}/{}: {} fast5 files in shard..".format(
            host_shard[0], host_shard[1], len(fast5_files)))
    print("{} fast5 files in total..".format(len(fast5_files)))
    motif_seqs = get_motif_seqs(cfg.motifs, cfg.is_dna)
    chrom2len = get_contig2len(reference_path) if reference_path else None
    positions = read_position_file(position_file) if position_file else None
    return fast5_files, motif_seqs, chrom2len, positions


def run_extract(fast5_dir: str, write_path: str, cfg: FeatureConfig,
                reference_path: Optional[str] = None, nproc: int = 1,
                f5_batch_num: int = 50, w_is_dir: bool = False,
                w_batch_num: int = 200, position_file: Optional[str] = None,
                is_recursive: bool = True) -> int:
    """Multiprocess feature extraction driver (extract_features.py:424-478).
    Returns the number of failed fast5 files."""
    start = time.time()
    fast5_files, motif_seqs, chrom2len, positions = _preprocess(
        fast5_dir, cfg, reference_path, position_file, is_recursive)

    n_workers = max(1, nproc - 1) if nproc > 1 else 1
    ctx = _worker_context()
    fast5s_q = ctx.JoinableQueue()
    rows_q = ctx.Queue(maxsize=QUEUE_MAX_BATCHES)
    errornum_q = ctx.Queue()

    for i in range(0, len(fast5_files), f5_batch_num):
        fast5s_q.put(fast5_files[i:i + f5_batch_num])
    for _ in range(n_workers):
        fast5s_q.put(None)

    workers = []
    with _host_worker_env():
        for w in range(n_workers):
            p = ctx.Process(target=_extract_worker,
                            args=(fast5s_q, rows_q, errornum_q, cfg,
                                  motif_seqs, chrom2len, positions, False),
                            daemon=True)
            p.start()
            workers.append(p)

        if w_is_dir:
            writer = ctx.Process(target=_write_rows_dir,
                                 args=(write_path, rows_q, w_batch_num),
                                 daemon=True)
        else:
            writer = ctx.Process(target=_write_rows_file,
                                 args=(write_path, rows_q), daemon=True)
        writer.start()

    for p in workers:
        p.join()
    rows_q.put(None)
    writer.join()

    errornum_sum = 0
    while True:
        try:
            errornum_sum += errornum_q.get_nowait()
        except queue_mod.Empty:
            break
    # a worker that died abnormally took its claimed file batches with it —
    # surface that instead of reporting a clean run (the streaming path has
    # the same detection via its sign-off protocol)
    crashed = sum(1 for p in workers if p.exitcode != 0)
    msg = "%d of %d fast5 files failed.." % (errornum_sum, len(fast5_files))
    if crashed:
        msg += ("  WARNING: %d extract worker(s) died abnormally; their "
                "in-flight file batches were NOT extracted." % crashed)
    print(msg + "\nextract_features costs %.1f seconds.."
          % (time.time() - start))
    return errornum_sum


def stream_fast5_feature_batches(fast5_dir: str, cfg: FeatureConfig,
                                 reference_path: Optional[str] = None,
                                 nproc: int = 2, f5_batch_num: int = 50,
                                 position_file: Optional[str] = None,
                                 is_recursive: bool = True,
                                 host_shard=None,
                                 stats: Optional[dict] = None
                                 ) -> Iterator[FeatureBatch]:
    """Featurize fast5s with a worker pool; yield FeatureBatches in the main
    process (which owns the TPU).  Mirrors _call_mods_from_fast5s_gpu's
    extractor fan-in (call_modifications.py:353-414).  ``host_shard=(k, n)``
    restricts to this host's stride shard of the fast5 list.

    Shutdown is deterministic: every input batch is answered with one
    ``("fb", ...)`` marker and every worker signs off with ``("done", ...)``
    — the loop ends when all workers are accounted for, with no reliance on
    ``Queue.empty()``.  A worker that dies without signing off is detected
    via liveness (only ever checked after a get timeout) and its in-flight
    batch is reported as lost rather than silently dropped.  Pass ``stats``
    to receive {"errors", "lost_batches", "crashed_workers", "n_batches"}
    and (while running) the worker process list under "workers".
    """
    fast5_files, motif_seqs, chrom2len, positions = _preprocess(
        fast5_dir, cfg, reference_path, position_file, is_recursive,
        host_shard)

    n_workers = max(1, nproc - 1)
    ctx = _worker_context()
    fast5s_q = ctx.JoinableQueue()
    batch_q = ctx.Queue(maxsize=QUEUE_MAX_BATCHES)

    n_batches = 0
    for i in range(0, len(fast5_files), f5_batch_num):
        fast5s_q.put(fast5_files[i:i + f5_batch_num])
        n_batches += 1
    for _ in range(n_workers):
        fast5s_q.put(None)

    workers = []
    with _host_worker_env():
        for w in range(n_workers):
            p = ctx.Process(target=_extract_worker,
                            args=(fast5s_q, batch_q, None, cfg, motif_seqs,
                                  chrom2len, positions, True, w),
                            daemon=True)
            p.start()
            workers.append(p)
    if stats is not None:
        stats["workers"] = workers

    pending = set(range(n_workers))
    presumed_crashed: set = set()
    received = 0
    errornum_sum = 0

    def _handle(item):
        nonlocal received, errornum_sum
        if item[0] == "done":
            pending.discard(item[1])
            presumed_crashed.discard(item[1])
            return None
        errornum_sum += item[2]
        received += 1
        return item[1]

    while pending:
        try:
            item = batch_q.get(timeout=0.5)
        except queue_mod.Empty:
            for w in list(pending):
                if not workers[w].is_alive():
                    # no sign-off and process gone -> crashed (unless its
                    # queued "done" is still in flight; reconciled in _handle)
                    pending.discard(w)
                    presumed_crashed.add(w)
            continue
        fb = _handle(item)
        if fb is not None:
            yield fb
    # drain anything a just-finished worker enqueued before sign-off
    while True:
        try:
            item = batch_q.get_nowait()
        except queue_mod.Empty:
            break
        fb = _handle(item)
        if fb is not None:
            yield fb

    for p in workers:
        p.join()
    lost = n_batches - received
    if stats is not None:
        stats.update(errors=errornum_sum, lost_batches=lost,
                     crashed_workers=len(presumed_crashed),
                     n_batches=n_batches)
        stats.pop("workers", None)
    msg = "%d of %d fast5 files failed.." % (errornum_sum, len(fast5_files))
    if lost or presumed_crashed:
        msg += ("  WARNING: %d worker(s) died mid-run; %d of %d file batches "
                "lost (not scored)." % (len(presumed_crashed), lost,
                                        n_batches))
    print(msg)


def _file_reader_proc(features_file: str, batch_q, reads_per_batch: int,
                      host_shard=None):
    for fb in iter_feature_batches_by_read(features_file, reads_per_batch,
                                           host_shard):
        batch_q.put(fb)
    batch_q.put(None)


def stream_file_feature_batches(features_file: str, reads_per_batch: int = 50,
                                background: bool = True, host_shard=None
                                ) -> Iterator[FeatureBatch]:
    """Read-grouped TSV streaming, optionally in a background reader process
    (call_modifications.py:450-455).  ``host_shard=(k, n)`` takes every n-th
    read-grouped batch starting at k — the multi-host stride partition
    (io.feature_codec.iter_feature_batches_by_read)."""
    if not background:
        yield from iter_feature_batches_by_read(features_file,
                                                reads_per_batch, host_shard)
        return
    ctx = _worker_context()
    batch_q = ctx.Queue(maxsize=QUEUE_MAX_BATCHES)
    reader = ctx.Process(target=_file_reader_proc,
                         args=(features_file, batch_q, reads_per_batch,
                               host_shard),
                         daemon=True)
    with _host_worker_env():
        reader.start()
    while True:
        fb = batch_q.get()
        if fb is None:
            break
        yield fb
    reader.join()
