"""Per-read call TSV and per-site frequency output codecs.

call_mods output TSV, 10 columns (call_modifications.py:184-190):
  chrom, pos, strand, pos_in_strand, readname, read_strand, prob_0, prob_1,
  called_label, k_mer     with prob_i = sigmoid_i / (sigmoid_0 + sigmoid_1).

Frequency TSV, 11 columns (scripts/call_modification_frequency.py:70-76):
  chrom, pos, strand, pos_in_strand, prob_0_sum, prob_1_sum, count_modified,
  count_unmodified, coverage, modification_frequency, k_mer
bedMethyl alternative at call_modification_frequency.py:64-68.
"""

from __future__ import annotations

import dataclasses
import gzip
from typing import Iterable, Iterator

import numpy as np

from ..core.constants import CODE2BASE_DNA, CODE2BASE_RNA, KEY_SEP

try:  # native row formatter (deepsignal_tpu/native/featkernel.cpp)
    from .. import _featkernel as _native
except ImportError:  # pragma: no cover - build-dependent
    _native = None


def _make_kmer_lut(code2base: dict) -> np.ndarray:
    """256-entry code -> ASCII lookup (256-wide so a uint8 code can never
    index out of bounds in the native path)."""
    lut = np.zeros(256, dtype=np.uint8)
    for code, base in code2base.items():
        lut[code] = ord(base)
    return lut


KMER_LUT_DNA = _make_kmer_lut(CODE2BASE_DNA)
KMER_LUT_RNA = _make_kmer_lut(CODE2BASE_RNA)


def decode_kmer_strings(kmers: np.ndarray, is_dna: bool = True) -> list:
    """Vectorized [N, K] code matrix -> list of K-char kmer strings."""
    n, k = kmers.shape
    lut = KMER_LUT_DNA if is_dna else KMER_LUT_RNA
    flat = lut[kmers.astype(np.intp)].tobytes()
    return [flat[i * k:(i + 1) * k].decode("ascii") for i in range(n)]


def _native_selfcheck() -> bool:
    """Probe the native call-row formatter against the Python chain at
    import time; ANY byte mismatch disables the native path (same
    discipline as featurize.signal's format_rows6 gate).  The float32 repr
    core is probed across every formatting regime: positional/scientific
    boundary values, subnormals, specials, signed zeros."""
    probe = np.array([0.5, 0.1, 1e-4, 9.9999e-5, 1e-5, 1.2345e-7, 1e-38,
                      1.4e-45, 0.0, -0.0, 1.0, 0.9999999, 123456.0, 1e8,
                      9.999999e15, 1e16, 2 / 3, 1 / 3, np.inf, -np.inf,
                      np.nan, -1.17549435e-38, -0.5], dtype=np.float32)
    if _native.repr_f32(probe) != [str(v) for v in probe]:
        return False
    info = ["chr1\t7\t+\t7\tread0\tt", "chrM\t9\t-\t1\tread1\tc"]
    p0 = np.array([0.25, 1e-6], dtype=np.float32)
    p1 = np.array([0.75, 0.999999], dtype=np.float32)
    pred = np.array([1, 1], dtype=np.int64)
    kmers = np.array([[0, 1, 2, 3, 4]] * 2, dtype=np.int32)
    expect = _format_call_block_py(info, p0, p1, pred, kmers, True)
    got = _native.format_call_block(info, p0, p1, pred, kmers,
                                    KMER_LUT_DNA.tobytes())
    return got == expect


def _format_call_block_py(sampleinfo, p0, p1, pred, kmers,
                          is_dna: bool) -> bytes:
    kmer_strs = decode_kmer_strings(kmers, is_dna)
    rows = [format_call_row(sampleinfo[i], p0[i], p1[i], int(pred[i]),
                            kmer_strs[i])
            for i in range(len(sampleinfo))]
    # utf-8: matches the native path's PyUnicode_AsUTF8 for non-ascii
    # sampleinfo (read names from arbitrary fast5 attrs)
    return "".join(r + "\n" for r in rows).encode("utf-8")


def count_read_runs(sampleinfo: list):
    """(n_runs, first_read, last_read) over the contiguous same-read runs
    of a batch's sampleinfo (read name = 5th tab field).  Under the
    read-grouping contract a read's rows are contiguous, so the number of
    NEW reads in a batch is ``n_runs`` minus one when the first run
    continues the previous batch's last read — O(1) cross-batch state
    instead of per-batch read sets."""
    if _native is not None and hasattr(_native, "count_read_runs"):
        return _native.count_read_runs(list(sampleinfo))
    runs = 0
    prev = None
    first = last = ""
    for s in sampleinfo:
        name = s.split("\t", 5)[4]
        if name != prev:
            runs += 1
            if runs == 1:
                first = name
        prev = name
    last = prev if prev is not None else ""
    return runs, first, last


def format_call_block(sampleinfo: list, p0: np.ndarray, p1: np.ndarray,
                      pred: np.ndarray, kmers: np.ndarray,
                      is_dna: bool = True) -> bytes:
    """All call rows of a batch as ONE newline-terminated bytes block.

    Byte-identical to joining ``format_call_row`` per site (the native
    kernel is import-time self-checked and regression-tested against the
    Python path, tests/test_native.py); one native call per drained batch
    replaces the per-site Python formatting that dominated the drain
    thread (~2 us/site Python vs ~0.3 us/site native)."""
    p0 = np.ascontiguousarray(p0, dtype=np.float32)
    p1 = np.ascontiguousarray(p1, dtype=np.float32)
    if _native is not None:
        lut = KMER_LUT_DNA if is_dna else KMER_LUT_RNA
        return _native.format_call_block(list(sampleinfo), p0, p1, pred,
                                         kmers, lut.tobytes())
    return _format_call_block_py(sampleinfo, p0, p1, pred, kmers, is_dna)


@dataclasses.dataclass
class ModRecord:
    """One per-read call row (scripts/txt_formater.py:8-27)."""

    chromosome: str
    pos: int
    strand: str
    pos_in_strand: int
    readname: str
    read_strand: str
    prob_0: float
    prob_1: float
    called_label: int
    kmer: str

    @property
    def site_key(self) -> str:
        return KEY_SEP.join([self.chromosome, str(self.pos)])

    def is_record_callable(self, prob_threshold: float) -> bool:
        """Ambiguity filter (txt_formater.py:23-27): drop the call when
        |prob_0 - prob_1| < threshold."""
        return abs(self.prob_0 - self.prob_1) >= prob_threshold

    @staticmethod
    def from_fields(words: list) -> "ModRecord":
        return ModRecord(words[0], int(words[1]), words[2], int(words[3]),
                         words[4], words[5], float(words[6]), float(words[7]),
                         int(words[8]), words[9])

    def to_line(self) -> str:
        return "\t".join([self.chromosome, str(self.pos), self.strand,
                          str(self.pos_in_strand), self.readname,
                          self.read_strand, str(self.prob_0), str(self.prob_1),
                          str(self.called_label), self.kmer])


@dataclasses.dataclass
class SiteStats:
    """Accumulator for one genomic site (scripts/txt_formater.py:34-46)."""

    strand: str
    pos_in_strand: int
    kmer: str
    prob_0: float = 0.0
    prob_1: float = 0.0
    met: int = 0
    unmet: int = 0
    coverage: int = 0


def split_key(key: str):
    words = key.split(KEY_SEP)
    return words[0], int(words[1])


def iter_call_records(path: str) -> Iterator[ModRecord]:
    """Stream ModRecords from a (possibly .gz) call_mods TSV
    (call_modification_frequency.py:22-27)."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as rf:
        for line in rf:
            yield ModRecord.from_fields(line.strip().split("\t"))


def format_call_row(sampleinfo: str, prob_0_norm: float, prob_1_norm: float,
                    called_label: int, k_mer: str) -> str:
    """Serialize one call row exactly as _call_mods
    (call_modifications.py:188-190): probs stringified with float64 repr."""
    return "\t".join([sampleinfo, str(prob_0_norm), str(prob_1_norm),
                      str(called_label), k_mer])


def format_frequency_row(chrom: str, pos: int, stats: SiteStats,
                         is_bed: bool = False) -> str:
    """Serialize one frequency row (call_modification_frequency.py:64-76)."""
    rmet = float(stats.met) / stats.coverage
    if is_bed:
        return "\t".join([chrom, str(pos), str(pos + 1), ".",
                          str(stats.coverage), stats.strand, str(pos),
                          str(pos + 1), "0,0,0", str(stats.coverage),
                          str(int(round(rmet * 100, 0)))])
    return "%s\t%d\t%s\t%d\t%.3f\t%.3f\t%d\t%d\t%d\t%.4f\t%s" % (
        chrom, pos, stats.strand, stats.pos_in_strand, stats.prob_0,
        stats.prob_1, stats.met, stats.unmet, stats.coverage, rmet, stats.kmer)


# The native gate runs at the END of the module: the selfcheck exercises
# the full Python fallback chain (format_call_row above), so every name it
# touches must already be defined — running it earlier silently disabled
# the native path via a swallowed NameError (caught by review, round 5).
if _native is not None and not hasattr(_native, "format_call_block"):
    _native = None  # stale build without the formatter
if _native is not None:
    try:
        if not _native_selfcheck():  # pragma: no cover - host-dependent
            import sys as _sys
            print("warning: native call-row formatter disagrees with the "
                  "Python path on this host; falling back", file=_sys.stderr)
            _native = None
    except Exception as _e:  # pragma: no cover - defensive
        import sys as _sys
        print("warning: native call-row formatter selfcheck raised "
              f"{type(_e).__name__}: {_e}; falling back", file=_sys.stderr)
        _native = None
