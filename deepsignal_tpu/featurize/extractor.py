"""Per-read feature extraction: resquiggled read -> per-motif-site features.

Vectorized re-design of ``_extract_features`` (extract_features.py:215-286):
instead of Python loops over sites building per-base lists, we compute
per-event stats for the whole read once (prefix sums) and gather k-mer
windows with numpy fancy indexing.  Output values match the reference
contract exactly (coordinate math at extract_features.py:254-261; feature
row format at extract_features.py:289-303).
"""

from __future__ import annotations

import dataclasses
import random
from typing import Optional

import numpy as np

from ..core.config import FeatureConfig
from ..core.constants import KEY_SEP, decode_seq, encode_seq, motif_sites_in_seq
from ..io.fast5 import ResquiggledRead, read_resquiggled_fast5
from ..io.feature_codec import format_feature_row
from .central import central_signals_batch
from .signal import normalize_signals, rescale_signals, segment_stats


@dataclasses.dataclass
class ReadFeatures:
    """Struct-of-arrays features for all motif sites of one read."""

    chrom: str
    align_strand: str
    readname: str
    read_strand: str
    pos: np.ndarray            # [S] genome coordinate (fwd strand, 0-based)
    pos_in_strand: np.ndarray  # [S] legacy strand coordinate (-1 if no ref)
    kmers: np.ndarray          # [S, K] int codes
    means: np.ndarray          # [S, K] float64
    stds: np.ndarray           # [S, K] float64
    lens: np.ndarray           # [S, K] int64
    cent_signals: np.ndarray   # [S, cent_len] float64
    methy_label: int
    is_dna: bool = True        # decode alphabet (U vs T) for kmer strings

    def __len__(self) -> int:
        return self.pos.shape[0]

    def to_tsv_rows(self) -> list:
        """Serialize with the exact reference row format
        (extract_features.py:289-303).  RNA reads decode code 3 back to 'U'
        (the reference writes the raw event-base string, so U survives).

        The float columns (2 x 17 + 360 str()-repr'd values per site) were
        the extract path's dominant cost (134 us/site measured); the native
        ``format_rows6`` kernel emits byte-identical reprs ~12x faster and
        falls back to the per-row python path when the extension is absent.
        """
        from .signal import _native
        if _native is None:
            return [format_feature_row(
                self.chrom, int(self.pos[i]), self.align_strand,
                int(self.pos_in_strand[i]), self.readname, self.read_strand,
                decode_seq(self.kmers[i], self.is_dna), self.means[i],
                self.stds[i], self.lens[i], self.cent_signals[i],
                self.methy_label) for i in range(len(self))]
        means_txt = _native.format_rows6(np.around(self.means, 6))
        stds_txt = _native.format_rows6(np.around(self.stds, 6))
        cent_txt = _native.format_rows6(self.cent_signals)  # pre-rounded
        label = str(self.methy_label)
        rows = []
        for i, (p, q) in enumerate(zip(self.pos.tolist(),
                                       self.pos_in_strand.tolist())):
            rows.append("\t".join([
                self.chrom, str(p), self.align_strand, str(q),
                self.readname, self.read_strand,
                decode_seq(self.kmers[i], self.is_dna), means_txt[i],
                stds_txt[i],
                ",".join(map(str, self.lens[i].tolist())), cent_txt[i],
                label]))
        return rows


def extract_read_features(read: ResquiggledRead, motif_seqs: list,
                          cfg: FeatureConfig,
                          chrom2len: Optional[dict] = None,
                          positions: Optional[set] = None,
                          rng: Optional[random.Random] = None,
                          ) -> Optional[ReadFeatures]:
    """Featurize one read.  Returns None when no sites pass the filters.

    Pipeline (extract_features.py:224-280): rescale to pA -> normalize whole
    read -> per-event stats -> motif scan -> per-site window gather.
    """
    kmer_len = cfg.kmer_len
    num_bases = (kmer_len - 1) // 2

    if rng is None and cfg.central_sample_seed is not None:
        # Per-READ derivation makes the (rare) oversized-middle-base
        # subsample deterministic regardless of worker count, queue order,
        # or process ids — any worker draws the same picks for a given read.
        rng = random.Random(f"{cfg.central_sample_seed}:{read.read_id}")

    norm = normalize_signals(
        rescale_signals(read.raw_signal, read.scaling, read.offset),
        cfg.normalize_method)

    starts = read.event_starts
    lengths = read.event_lengths
    n_events = starts.shape[0]

    ev_means, ev_stds = segment_stats(norm, starts, lengths)

    seq_codes = encode_seq(read.seq, cfg.is_dna)
    tsite_locs = motif_sites_in_seq(seq_codes, motif_seqs, cfg.mod_loc,
                                    cfg.is_dna)
    # keep sites with a full k-mer window (extract_features.py:255)
    tsite_locs = tsite_locs[(tsite_locs >= num_bases)
                            & (tsite_locs < n_events - num_bases)]
    if tsite_locs.size == 0:
        return None

    # genome coordinates (extract_features.py:256-261)
    chromlen = None
    if chrom2len is not None:
        chromlen = chrom2len.get(read.chrom)
        if chromlen is None:
            print("warning - chrom_name in fast5 not in provided reference genome!")
    if read.align_strand == "-":
        pos = read.chrom_start + n_events - 1 - tsite_locs
    else:
        pos = read.chrom_start + tsite_locs
    if chromlen is not None:
        pos_in_strand = (chromlen - 1 - pos) if read.align_strand == "-" else pos
    else:
        pos_in_strand = np.full_like(pos, -1)

    if positions is not None:
        keep = np.fromiter(
            (KEY_SEP.join([read.chrom, str(int(p)), read.align_strand])
             in positions for p in pos),
            dtype=bool, count=pos.shape[0])
        tsite_locs, pos, pos_in_strand = (tsite_locs[keep], pos[keep],
                                          pos_in_strand[keep])
        if tsite_locs.size == 0:
            return None

    # window gather: [S, K] index matrix over events
    win = tsite_locs[:, None] + np.arange(-num_bases, num_bases + 1)[None, :]
    kmers = seq_codes[win]
    means = ev_means[win]
    stds = ev_stds[win]
    lens = lengths[win]

    cent = central_signals_batch(norm, starts, lengths, win,
                                 cfg.cent_signals_len, rng)

    return ReadFeatures(
        chrom=read.chrom, align_strand=read.align_strand,
        readname=read.read_id, read_strand=read.read_strand,
        pos=pos, pos_in_strand=pos_in_strand, kmers=kmers, means=means,
        stds=stds, lens=lens, cent_signals=cent, methy_label=cfg.methy_label,
        is_dna=cfg.is_dna)


def extract_fast5_batch(fast5_paths: list, motif_seqs: list,
                        cfg: FeatureConfig,
                        chrom2len: Optional[dict] = None,
                        positions: Optional[set] = None,
                        rng: Optional[random.Random] = None):
    """Featurize a batch of fast5 files with per-file fault isolation
    (extract_features.py:224-283: failures counted, extraction continues).

    Returns (list[ReadFeatures], error_count).  A file whose corrected
    Alignment group is missing counts as an error, matching the reference's
    blanket-except behavior on the empty alignment tuple.
    """
    out = []
    errors = 0
    for path in fast5_paths:
        try:
            read = read_resquiggled_fast5(path, cfg.corrected_group,
                                          cfg.basecall_subgroup)
            if read is None:
                errors += 1
                continue
            feats = extract_read_features(read, motif_seqs, cfg, chrom2len,
                                          positions, rng)
            if feats is not None:
                out.append(feats)
        except Exception:
            errors += 1
            continue
    return out, errors


def read_features_to_batch(feats_list: list) -> Optional["FeatureBatch"]:
    """Pack per-read features into one FeatureBatch for the caller, keeping
    each read's sites contiguous (the v0.1.10 read-grouping contract,
    call_modifications.py:100-122)."""
    from ..io.feature_codec import FeatureBatch
    if not feats_list:
        return None
    # Hot path (one call per worker file-batch).  Two measured wins vs the
    # naive form (profile_featurize.py): ``tolist()`` + string concat avoids
    # a numpy-scalar box + int() per field (~10x on the sampleinfo build),
    # and ``np.concatenate(..., dtype=)`` fuses the f64->f32 cast into the
    # copy instead of materializing the f64 concat first.
    sampleinfo = []
    for f in feats_list:
        head = f.chrom + "\t"
        mid = "\t" + f.align_strand + "\t"
        tail = "\t" + f.readname + "\t" + f.read_strand
        sampleinfo += [head + str(p) + mid + str(q) + tail
                       for p, q in zip(f.pos.tolist(),
                                       f.pos_in_strand.tolist())]
    counts = [len(f) for f in feats_list]
    return FeatureBatch(
        sampleinfo=sampleinfo,
        kmers=np.concatenate([f.kmers for f in feats_list],
                             dtype=np.int32),
        means=np.concatenate([f.means for f in feats_list],
                             dtype=np.float32),
        stds=np.concatenate([f.stds for f in feats_list],
                            dtype=np.float32),
        lens=np.concatenate([f.lens for f in feats_list],
                            dtype=np.int32),
        signals=np.concatenate([f.cent_signals for f in feats_list],
                               dtype=np.float32),
        labels=np.repeat(np.asarray([f.methy_label for f in feats_list],
                                    dtype=np.int32), counts),
    )


def read_position_file(position_file: str) -> set:
    """Positions filter file: TSV chrom, fwd-pos, strand
    (extract_features.py:388-394)."""
    positions = set()
    with open(position_file, "r") as rf:
        for line in rf:
            words = line.strip().split("\t")
            positions.add(KEY_SEP.join(words[:3]))
    return positions
