"""Feature-record codecs: 12-column TSV and fixed-length binary records.

Exact contracts (SURVEY.md §2.5):

TSV columns (extract_features.py:1-4,289-303):
  chrom, pos, strand, pos_in_strand, readname, read_strand, k_mer,
  signal_means (k csv, 6dp), signal_stds (k csv, 6dp), signal_lens (k csv int),
  cent_signals (s csv), methy_label

Binary record = struct ``'<{k}B{k}f{k}f{k}H{s}f1B'`` little-endian
(scripts/generate_binary_feature_file.py:52-53, process_utils.py:355-373,
unpacked by tf_utils.py:7-28): for k=17, s=360 -> 1,628 bytes.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional

import numpy as np

from ..core.constants import BASE2CODE_DNA

try:  # optional native parser (deepsignal_tpu/native/fastparse.cpp)
    from .. import _fastparse as _native
except ImportError:  # pragma: no cover - build-dependent
    _native = None

# kmer-column encode LUT for TSV parsing.  Matches the native parser's
# base_code(): A/C/G/T as the DNA codes, U as 3 (RNA kmers in feature files
# written by RNA-mode extract), anything else N=4.  The alphabet is decided
# at decode time (io.calls_codec.decode_kmer_strings), so one combined
# encode table serves both.
_PARSE_CODE_LUT = np.full(256, BASE2CODE_DNA["N"], dtype=np.int32)
for _b, _c in BASE2CODE_DNA.items():
    _PARSE_CODE_LUT[ord(_b)] = _c
_PARSE_CODE_LUT[ord("U")] = BASE2CODE_DNA["T"]


def _encode_kmer_col(kmer: str) -> np.ndarray:
    raw = np.frombuffer(kmer.encode("ascii", errors="replace"), dtype=np.uint8)
    return _PARSE_CODE_LUT[raw]


@dataclasses.dataclass
class FeatureBatch:
    """Struct-of-arrays batch of feature rows.

    ``sampleinfo`` keeps the first six TSV columns joined by tabs, exactly as
    the reference threads them through calling (call_modifications.py:51,113).
    """

    sampleinfo: list  # list[str], len N
    kmers: np.ndarray        # [N, K] int
    means: np.ndarray        # [N, K] float32
    stds: np.ndarray         # [N, K] float32
    lens: np.ndarray         # [N, K] int  (signal point count per base)
    signals: np.ndarray      # [N, S] float32 (central raw signals)
    labels: np.ndarray       # [N] int

    def __len__(self) -> int:
        return len(self.sampleinfo)

    def __getitem__(self, idx) -> "FeatureBatch":
        sl = idx if isinstance(idx, slice) else slice(idx, idx + 1)
        return FeatureBatch(self.sampleinfo[sl], self.kmers[sl], self.means[sl],
                            self.stds[sl], self.lens[sl], self.signals[sl],
                            self.labels[sl])

    @staticmethod
    def concat(batches: list["FeatureBatch"]) -> "FeatureBatch":
        return FeatureBatch(
            sampleinfo=[s for b in batches for s in b.sampleinfo],
            kmers=np.concatenate([b.kmers for b in batches]),
            means=np.concatenate([b.means for b in batches]),
            stds=np.concatenate([b.stds for b in batches]),
            lens=np.concatenate([b.lens for b in batches]),
            signals=np.concatenate([b.signals for b in batches]),
            labels=np.concatenate([b.labels for b in batches]),
        )


def binary_record_dtype(kmer_len: int = 17, signal_len: int = 360) -> np.dtype:
    """Packed little-endian structured dtype matching the reference's struct
    format string '<{k}B{k}f{k}f{k}H{s}f1B'."""
    return np.dtype([
        ("bases", "u1", (kmer_len,)),
        ("means", "<f4", (kmer_len,)),
        ("stds", "<f4", (kmer_len,)),
        ("lens", "<u2", (kmer_len,)),
        ("signals", "<f4", (signal_len,)),
        ("label", "u1"),
    ])


def binary_record_len(kmer_len: int = 17, signal_len: int = 360) -> int:
    """Record byte length (train_model.py:67-79): 11*k + 4*s + 1."""
    return kmer_len * 11 + signal_len * 4 + 1


def parse_feature_lines(lines, kmer_len: Optional[int] = None,
                        signal_len: Optional[int] = None) -> FeatureBatch:
    """Parse TSV feature lines into a FeatureBatch.

    Mirrors the per-line parse in ``_read_features_file``
    (call_modifications.py:51-57): col6 k-mer -> codes, cols 7-10 csv floats/
    ints, col 11 label.  Uses the native C++ block parser when built
    (5-10x the Python path); pass kmer_len/signal_len to skip probing them
    from the first row.
    """
    lines = list(lines)
    if _native is not None and lines:
        if kmer_len is None or signal_len is None:
            w = lines[0].split("\t")
            kmer_len = len(w[6])
            signal_len = w[10].count(",") + 1
        block = "".join(l if l.endswith("\n") else l + "\n"
                        for l in lines).encode()
        (sampleinfo, kmers, means, stds, lens, signals,
         labels) = _native.parse_feature_block(block, kmer_len, signal_len)
        return FeatureBatch(sampleinfo, kmers, means, stds, lens, signals,
                            labels)
    sampleinfo = []
    kmers, means, stds, lens, signals, labels = [], [], [], [], [], []
    for line in lines:
        words = line.rstrip("\n").split("\t")
        sampleinfo.append("\t".join(words[0:6]))
        kmers.append(_encode_kmer_col(words[6]))
        means.append(np.array(words[7].split(","), dtype=np.float32))
        stds.append(np.array(words[8].split(","), dtype=np.float32))
        lens.append(np.array(words[9].split(","), dtype=np.int32))
        signals.append(np.array(words[10].split(","), dtype=np.float32))
        labels.append(int(words[11]))
    return FeatureBatch(
        sampleinfo=sampleinfo,
        kmers=np.asarray(kmers, dtype=np.int32),
        means=np.asarray(means, dtype=np.float32),
        stds=np.asarray(stds, dtype=np.float32),
        lens=np.asarray(lens, dtype=np.int32),
        signals=np.asarray(signals, dtype=np.float32),
        labels=np.asarray(labels, dtype=np.int32),
    )


def parse_feature_bytes(block: bytes, kmer_len: int,
                        signal_len: int) -> FeatureBatch:
    """Parse a raw bytes block of feature rows (fast path: native parser,
    no per-line Python strings)."""
    if _native is not None:
        (sampleinfo, kmers, means, stds, lens, signals,
         labels) = _native.parse_feature_block(block, kmer_len, signal_len)
        return FeatureBatch(sampleinfo, kmers, means, stds, lens, signals,
                            labels)
    return parse_feature_lines(block.decode().splitlines(True), kmer_len,
                               signal_len)


def iter_feature_bytes_chunks(path: str, chunk_bytes: int = 8 << 20):
    """Stream a TSV file as line-aligned byte blocks."""
    with open(path, "rb") as rf:
        carry = b""
        while True:
            block = rf.read(chunk_bytes)
            if not block:
                if carry:
                    yield carry
                return
            block = carry + block
            cut = block.rfind(b"\n")
            if cut < 0:
                carry = block
                continue
            carry = block[cut + 1:]
            yield block[:cut + 1]


def iter_feature_batches_by_read(features_file: str,
                                 reads_per_batch: int = 50,
                                 host_shard=None) -> Iterator[FeatureBatch]:
    """Stream a feature TSV grouped by read.

    Reproduces ``_read_features_file`` (call_modifications.py:35-91): rows for
    one read stay contiguous within a batch; a batch is emitted whenever
    ``reads_per_batch`` distinct reads have completed (the v0.1.10 read-
    grouping contract).

    ``host_shard=(k, n)`` keeps only every n-th read-grouped batch starting
    at k — the multi-host stride partition for feature-TSV input (every host
    computes the same global grouping, so shards are disjoint and their union
    is exactly the single-host batch stream).  Non-owned batches are never
    parsed, only line-grouped.
    """
    k, n = host_shard if host_shard is not None else (0, 1)
    pending: list[str] = []
    readid_pre: Optional[str] = None
    r_num = 0
    b_num = 0
    with open(features_file, "r") as rf:
        for line in rf:
            readid = line.split("\t", 5)[4]
            if readid_pre is None:
                readid_pre = readid
            elif readid != readid_pre:
                r_num += 1
                readid_pre = readid
                if r_num % reads_per_batch == 0:
                    if b_num % n == k:
                        yield parse_feature_lines(pending)
                    b_num += 1
                    pending = []
            if b_num % n == k:
                pending.append(line)
    if pending and b_num % n == k:
        yield parse_feature_lines(pending)


def format_feature_row(chrom: str, pos: int, strand: str, pos_in_strand: int,
                       readname: str, read_strand: str, k_mer: str,
                       signal_means, signal_stds, signal_lens,
                       cent_signals, methy_label: int) -> str:
    """Serialize one feature row exactly as ``_features_to_str``
    (extract_features.py:289-303): means/stds rounded to 6 decimals and
    stringified with numpy float64 repr semantics."""
    means_text = ",".join(str(x) for x in np.around(signal_means, decimals=6))
    stds_text = ",".join(str(x) for x in np.around(signal_stds, decimals=6))
    lens_text = ",".join(str(int(x)) for x in signal_lens)
    cent_text = ",".join(str(x) for x in np.asarray(cent_signals))
    return "\t".join([chrom, str(pos), strand, str(pos_in_strand), readname,
                      read_strand, k_mer, means_text, stds_text, lens_text,
                      cent_text, str(methy_label)])


def read_binary_features(path: str, kmer_len: int = 17,
                         signal_len: int = 360) -> FeatureBatch:
    """Load a whole binary feature file (tf_utils.py:7-28 layout)."""
    rec = np.fromfile(path, dtype=binary_record_dtype(kmer_len, signal_len))
    n = rec.shape[0]
    return FeatureBatch(
        sampleinfo=[""] * n,
        kmers=rec["bases"].astype(np.int32),
        means=rec["means"].astype(np.float32),
        stds=rec["stds"].astype(np.float32),
        lens=rec["lens"].astype(np.int32),
        signals=rec["signals"].astype(np.float32),
        labels=rec["label"].astype(np.int32),
    )


def convert_txt_to_binary(txt_path: str, bin_path: str, kmer_len: int = 17,
                          signal_len: int = 360, chunk_lines: int = 100000) -> int:
    """TSV features -> fixed-length binary records, streaming.

    Equivalent of ``process_utils.extract`` (process_utils.py:355-373) /
    ``scripts/generate_binary_feature_file.py``; returns the record count.
    """
    dtype = binary_record_dtype(kmer_len, signal_len)
    total = 0
    with open(txt_path, "r") as rf, open(bin_path, "wb") as wf:
        chunk: list[str] = []
        for line in rf:
            chunk.append(line)
            if len(chunk) >= chunk_lines:
                total += _write_binary_chunk(chunk, wf, dtype)
                chunk = []
        if chunk:
            total += _write_binary_chunk(chunk, wf, dtype)
    return total


def _write_binary_chunk(lines: list, wf, dtype: np.dtype) -> int:
    batch = parse_feature_lines(lines)
    rec = np.empty(len(batch), dtype=dtype)
    rec["bases"] = batch.kmers.astype(np.uint8)
    rec["means"] = batch.means
    rec["stds"] = batch.stds
    rec["lens"] = batch.lens.astype(np.uint16)
    rec["signals"] = batch.signals
    rec["label"] = batch.labels.astype(np.uint8)
    rec.tofile(wf)
    return rec.shape[0]
