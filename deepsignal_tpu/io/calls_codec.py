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

from ..core.constants import KEY_SEP


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
