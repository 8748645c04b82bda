"""Modification-calling engine: batched jit inference over a device mesh.

TPU re-design of ``_call_mods`` / ``_call_mods_q``
(call_modifications.py:149-236).  The reference runs one TF session per CPU
process and feeds python lists through feed_dict per 512-batch; here a single
jitted function is compiled once per fixed [batch_size, ...] shape, params
live on device, and batches are padded to the fixed shape (mask by valid
count) so XLA never recompiles.  On a mesh the batch is sharded along the
data axis and params are replicated (SURVEY.md §2.3 TPU-native equivalents).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import ModelConfig
from ..io.calls_codec import (count_read_runs, decode_kmer_strings,
                              format_call_block, format_call_row)
from ..io.feature_codec import FeatureBatch
from ..models.deepsignal import DeepSignalNet, predictions
from ..parallel.mesh import batch_sharding, replicated


_warned_sanums = False


def compact_wire_arrays(kmer, means, stds, sanums, signals, wire_f):
    """The compact h2d wire format shared by inference (ModCaller) and
    training (Trainer._device_batch): int8 kmer codes, ``wire_f`` floats
    (bfloat16 on the fast path — identical to the on-device f32->bf16 cast,
    RTNE; float32 on the parity path — lossless), uint16 per-base signal
    counts.

    sanums ride as uint16 — the same range as the reference's ``<u2``
    binary feature record (SURVEY.md §2.5), so overflow is pathological
    input; it is clipped to keep the batch scoring but surfaced once per
    process."""
    global _warned_sanums
    if np.max(sanums, initial=0) > 65535 and not _warned_sanums:
        _warned_sanums = True
        print("warning: per-base signal count > 65535 clipped to the "
              "uint16 wire range (matches the reference's <u2 binary "
              "record limit)")
    return (np.ascontiguousarray(kmer, dtype=np.int8),
            np.ascontiguousarray(means, dtype=wire_f),
            np.ascontiguousarray(stds, dtype=wire_f),
            np.ascontiguousarray(np.clip(sanums, 0, 65535),
                                 dtype=np.uint16),
            np.ascontiguousarray(signals, dtype=wire_f))


class ModCaller:
    """Owns the jitted inference step + fixed-shape batching.

    Wire format: host->device transfers through the PCIe/tunnel link are the
    inference bottleneck (per-call latency + bytes), so batches are packed
    before ``device_put``: kmer codes as int8 and per-base signal counts as
    uint16 (both exact — codes are 0..4, counts are small integers), and on
    the bfloat16 compute path the float features ship as bfloat16 (identical
    to the on-device f32->bf16 cast the model would do anyway, RTNE both
    ways).  The f32 parity path keeps float32 floats so results stay
    bit-identical to the unpacked path (tests/test_caller.py).
    """

    def __init__(self, cfg: ModelConfig, variables, batch_size: int = 4096,
                 mesh=None):
        self.cfg = cfg
        self.batch_size = batch_size
        self.mesh = mesh
        self.model = DeepSignalNet(cfg)
        self._wire_f = (np.dtype(jnp.bfloat16)
                        if jnp.dtype(cfg.compute_dtype) == jnp.bfloat16
                        else np.dtype(np.float32))

        def _infer(variables, kmer, means, stds, sanums, signals):
            kmer = kmer.astype(jnp.int32)
            logits = self.model.apply(variables, kmer, means, stds, sanums,
                                      signals, train=False)
            # activation = sigmoid, NOT softmax (model.py:99-100); the
            # prob_i / (prob_0 + prob_1) renormalization happens on the HOST
            # in float32 numpy, exactly like the reference
            # (call_modifications.py:185-187), so the formatted prob strings
            # are byte-identical given identical sigmoid outputs.
            act = jax.nn.sigmoid(logits)
            # inference model is built with default pos_weight=1.0
            # (call_modifications.py:203-205) -> argmax rule
            pred = predictions(logits, 1.0)
            return act, pred

        if mesh is not None:
            data = batch_sharding(mesh)
            repl = replicated(mesh)
            self._infer = jax.jit(
                _infer,
                in_shardings=(repl, data, data, data, data, data),
                out_shardings=(data, data))
            self.variables = jax.device_put(variables, repl)
            self._data = data
        else:
            self._infer = jax.jit(_infer)
            self.variables = jax.device_put(variables)
            self._data = None

    def _pack(self, kmer, means, stds, sanums, signals):
        """Pack a padded fixed-shape batch into the compact wire format
        (shared with the trainer: ``compact_wire_arrays``)."""
        return compact_wire_arrays(kmer, means, stds, sanums, signals,
                                   self._wire_f)

    def _run_fixed(self, kmer, means, stds, sanums, signals):
        kmer, means, stds, sanums, signals = self._pack(
            kmer, means, stds, sanums, signals)
        if self._data is not None:
            # Explicit h2d onto the batch sharding: a host-LOCAL mesh is
            # fully addressable so this works even under jax.distributed
            # (where jit itself rejects numpy inputs with non-replicated
            # shardings), and it starts the transfer before dispatch.
            kmer, means, stds, sanums, signals = jax.device_put(
                (kmer, means, stds, sanums, signals),
                (self._data,) * 5)
        else:
            # Explicit async device_put (vs letting jit block on the h2d at
            # dispatch) so transfers for batch i+1 are already in flight
            # while batch i computes.
            kmer, means, stds, sanums, signals = jax.device_put(
                (kmer, means, stds, sanums, signals))
        return self._infer(self.variables, kmer, means, stds, sanums, signals)

    def dispatch_feature_batch(self, fb: FeatureBatch):
        """Asynchronously dispatch all fixed-shape device sub-batches for a
        FeatureBatch; returns an opaque handle for ``collect``.

        JAX async dispatch means this returns as soon as the transfers and
        XLA executions are enqueued — callers can keep several FeatureBatches
        in flight so the chip never waits on host-side formatting/IO."""
        n = len(fb)
        bs = self.batch_size
        pending = []
        for i in range(0, n, bs):
            j = min(i + bs, n)
            kmer = _pad(fb.kmers[i:j], bs)
            means = _pad(fb.means[i:j], bs)
            stds = _pad(fb.stds[i:j], bs)
            sanums = _pad(fb.lens[i:j].astype(np.float32), bs)
            signals = _pad(fb.signals[i:j], bs)
            act, pred = self._run_fixed(kmer, means, stds, sanums, signals)
            # Start the device->host copy of the (tiny) outputs NOW: it is
            # enqueued behind the compute, so by the time ``collect`` runs —
            # pipeline_depth batches later — the values are already host-side
            # and np.asarray is a cache hit instead of a blocking round trip.
            # Measured on the bench host: the drain loop was spending 88% of
            # its wall clock in ``Array._value`` (~108 ms/fetch through the
            # tunnel); this also hides the (smaller) PCIe latency on real
            # hosts.
            for out in (act, pred):
                try:
                    out.copy_to_host_async()
                except Exception:  # pure optimization; e.g. multi-device
                    break          # arrays on some backends don't support it
            pending.append((i, j, (act, pred)))
        return fb, pending

    def call_feature_batch(self, fb: FeatureBatch, is_dna: bool = True):
        """Score a FeatureBatch; returns (pred_rows, predictions, probs).

        Rows follow the exact 10-column output contract
        (call_modifications.py:184-190), in input order (the read-grouping
        contract holds because input batches are read-grouped).  Prob strings
        reproduce the reference's host chain byte-for-byte: float32 sigmoid
        outputs renormalized with float32 numpy division and stringified as
        np.float32 scalars (call_modifications.py:185-190).
        """
        return self.collect(self.dispatch_feature_batch(fb), is_dna=is_dna)

    def _resolve(self, handle):
        """Block on a ``dispatch_feature_batch`` handle; returns
        (fb, pred[n] int64, p0[n] f32, p1[n] f32) with the reference's
        host-side float32 renormalization (call_modifications.py:185-187)."""
        fb, pending = handle
        n = len(fb)
        all_pred = np.empty(n, dtype=np.int64)
        all_p0 = np.empty(n, dtype=np.float32)
        all_p1 = np.empty(n, dtype=np.float32)
        for i, j, (act, pred) in pending:
            valid = j - i
            act = np.asarray(act)[:valid]  # float32 [valid, 2] sigmoid
            total = act[:, 0] + act[:, 1]
            all_p0[i:j] = act[:, 0] / total
            all_p1[i:j] = act[:, 1] / total
            all_pred[i:j] = np.asarray(pred)[:valid]
        return fb, all_pred, all_p0, all_p1

    def collect(self, handle, is_dna: bool = True):
        """Block on a ``dispatch_feature_batch`` handle and format rows."""
        fb, all_pred, all_p0, all_p1 = self._resolve(handle)
        kmer_strs = decode_kmer_strings(fb.kmers, is_dna)
        rows = [format_call_row(fb.sampleinfo[idx], all_p0[idx], all_p1[idx],
                                int(all_pred[idx]), kmer_strs[idx])
                for idx in range(len(fb))]
        return rows, all_pred, (all_p0, all_p1)

    def collect_block(self, handle, is_dna: bool = True):
        """Like ``collect`` but returns the formatted rows as ONE bytes
        block (newline-terminated), byte-identical to joining the
        ``collect`` rows.  The drain path uses this: one native formatter
        call per batch instead of a Python loop per site (VERDICT r4 #2)."""
        fb, all_pred, all_p0, all_p1 = self._resolve(handle)
        block = format_call_block(fb.sampleinfo, all_p0, all_p1, all_pred,
                                  fb.kmers, is_dna)
        return block, all_pred, (all_p0, all_p1)


def coalesce_feature_batches(batches: Iterable[FeatureBatch],
                             n: int) -> Iterator[FeatureBatch]:
    """Re-chunk a stream of FeatureBatches into batches of exactly ``n``
    rows (the last one may be smaller), preserving row order.

    The streaming featurizer emits one FeatureBatch per fast5 file-batch
    (~f5_batch_num * sites-per-read rows); device batches want to be much
    larger than that on TPU (per-call transfer latency dominates), so the
    driver coalesces across file-batch boundaries before dispatch."""
    pending: list = []
    count = 0
    for fb in batches:
        pending.append(fb)
        count += len(fb)
        while count >= n:
            cat = FeatureBatch.concat(pending) if len(pending) > 1 \
                else pending[0]
            yield cat[:n]
            rest = cat[n:]
            pending = [rest] if len(rest) else []
            count = len(rest)
    if count:
        yield FeatureBatch.concat(pending) if len(pending) > 1 \
            else pending[0]


def _pad(arr: np.ndarray, batch_size: int) -> np.ndarray:
    """Pad the leading axis to the fixed batch size (repeat last row so the
    padded lanes stay numerically benign; they are discarded by valid count)."""
    n = arr.shape[0]
    if n == batch_size:
        return arr
    reps = np.repeat(arr[-1:], batch_size - n, axis=0)
    return np.concatenate([arr, reps], axis=0)


# The shipped call_mods compute dtype.  bfloat16 is the fast path (1.6x the
# f32 chip rate) and its drift is gated: 0/2048 binary call flips and
# max |dprob| ~7e-5 vs the CPU true-f32 oracle on real hardware
# (docs/PERF.md; regression-gated by tests/test_bf16_gate.py).  Pass
# compute_dtype="float32" for the bit-parity mode.
DEFAULT_COMPUTE_DTYPE = "bfloat16"


def run_call_mods(input_path: str, model_path: str, result_file: str,
                  feature_cfg, batch_size: int = 4096, nproc: int = 2,
                  f5_batch_num: int = 50, reference_path=None,
                  position_file=None, is_recursive: bool = True,
                  use_mesh: bool = True, model_cfg_override=None,
                  profile_dir=None, compute_dtype=None,
                  lstm_impl=None) -> int:
    """Top-level call_mods driver (call_modifications.py:417-495): dispatch
    on fast5-dir vs feature-TSV input, stream batches through the jitted
    caller, write the 10-column call TSV.  Returns the call count.

    ``compute_dtype=None`` selects the shipped default
    (``DEFAULT_COMPUTE_DTYPE`` = bfloat16); pass "float32" for the
    reference-parity path.

    Multi-host: when launched under ``jax.distributed`` (process_count > 1)
    each host consumes its stride shard of the input — of the fast5 list for
    dir input, of the read-grouped batch stream for feature-TSV input — and
    writes ``<result_file>.part<k>-of-<n>`` (merge with parallel.dist or feed
    the shards straight to call_freq)."""
    import os
    import time

    import jax

    from ..core.logging import ThroughputMeter, trace
    from ..parallel.dist import shard_output_path
    from ..parallel.mesh import make_mesh
    from ..train.checkpoints import load_checkpoint
    from .pipeline import (stream_fast5_feature_batches,
                           stream_file_feature_batches)

    start = time.time()
    cfg, variables = load_checkpoint(os.path.abspath(model_path),
                                     cfg=model_cfg_override)
    compute_dtype = compute_dtype or DEFAULT_COMPUTE_DTYPE
    # perf knobs orthogonal to the checkpointed architecture; lstm_impl
    # picks the scan vs the fused Pallas encoder kernel
    import dataclasses
    cfg = dataclasses.replace(
        cfg,
        compute_dtype=compute_dtype,
        matmul_precision=("default" if compute_dtype == "bfloat16"
                          else "highest"),
        **({"lstm_impl": lstm_impl} if lstm_impl else {}))
    # Host-LOCAL mesh: inference has zero cross-host data dependencies, so
    # each host runs its own mesh over its addressable chips on its own read
    # shard (no lockstep batch-count requirement between hosts, no
    # make_array_from_process_local_data on the hot path).  Training is the
    # opposite: a global mesh with psum'd gradients (train/trainer.py).
    # announce the active compute dtype: the shipped default is bfloat16
    # (gated, docs/PERF.md) and its probabilities differ from the f32
    # reference path by ~1e-4 — parity-sensitive users need to see which
    # path scored this run (pass --compute_dtype float32 for bit-parity)
    print("compute dtype: %s%s" % (
        cfg.compute_dtype,
        "" if cfg.compute_dtype == "float32"
        else "  (pass --compute_dtype float32 for reference-parity probs)"))
    mesh = make_mesh(local=True) if use_mesh else None
    caller = ModCaller(cfg, variables, batch_size=batch_size, mesh=mesh)

    n_hosts = jax.process_count()
    result_file = shard_output_path(result_file)

    input_path = os.path.abspath(input_path)
    if os.path.isdir(input_path):
        batches = stream_fast5_feature_batches(
            input_path, feature_cfg, reference_path=reference_path,
            nproc=nproc, f5_batch_num=f5_batch_num,
            position_file=position_file, is_recursive=is_recursive,
            host_shard=(jax.process_index(), n_hosts))
    else:
        batches = stream_file_feature_batches(
            input_path, f5_batch_num,
            host_shard=(jax.process_index(), n_hosts))

    meter = ThroughputMeter("call_mods")
    with trace(profile_dir):
        count = call_mods_on_batches(caller, batches, result_file,
                                     meter=meter,
                                     is_dna=getattr(feature_cfg, "is_dna",
                                                    True))
    print(meter.line())
    print("call_mods costs %.2f seconds.." % (time.time() - start))
    return count


def call_mods_on_batches(caller: ModCaller,
                         batches: Iterable[FeatureBatch],
                         out_path: str,
                         meter=None, is_dna: bool = True,
                         pipeline_depth: int = 2) -> int:
    """Pipelined driver: stream read-grouped FeatureBatches -> call TSV.

    Equivalent of the reference's reader->TF->writer process pipeline
    (call_modifications.py:450-491) collapsed to one process; the streaming
    multiprocess front-end lives in runtime.pipeline.  Up to
    ``pipeline_depth`` FeatureBatches are dispatched ahead of the one being
    formatted/written, so device transfer+compute — and the async
    device->host result copies started at dispatch — overlap host TSV work
    (depth 4 measured no better than 2 through the tunnel; kept at 2).
    """
    from collections import deque

    count = 0
    in_flight: deque = deque()
    # Exact read accounting with O(1) cross-batch state: a read's rows are
    # contiguous in the stream (the v0.1.10 read-grouping contract holds
    # through coalesce_feature_batches), so new reads in a batch = its
    # contiguous-run count, minus one when the first run continues the
    # previous batch's last read (one native pass per batch,
    # calls_codec.count_read_runs).  On a user-supplied TSV that VIOLATES
    # the grouping contract, each contiguous run counts as one read
    # appearance — the meter is a throughput diagnostic, and the scored
    # output itself is unaffected either way.
    prev_last_read = None
    with open(out_path, "wb") as wf:
        def drain_one():
            nonlocal count, prev_last_read
            handle = in_flight.popleft()
            fb = handle[0]
            # one native formatter call per batch (byte-identical to the
            # per-row ``collect`` path, tests/test_caller.py)
            block, _, _ = caller.collect_block(handle, is_dna=is_dna)
            wf.write(block)
            count += len(fb)
            if meter is not None and fb.sampleinfo:
                runs, first, last = count_read_runs(fb.sampleinfo)
                meter.update(sites=len(fb),
                             reads=runs - (1 if first == prev_last_read
                                           else 0))
                prev_last_read = last
            wf.flush()

        for fb in coalesce_feature_batches(batches, caller.batch_size):
            in_flight.append(caller.dispatch_feature_batch(fb))
            if len(in_flight) > pipeline_depth:
                drain_one()
        while in_flight:
            drain_one()
    return count
