"""Per-stage profile of ONE featurize worker (VERDICT r3 #4).

Times each stage of the worker hot path separately over a synthetic corpus:
h5 decode -> normalize (MAD) -> segment stats -> motif scan -> window gather
-> central signals -> FeatureBatch packing, plus the whole-path rate, so the
optimization target is named by measurement rather than guessed.

Run host-only (no TPU): python scripts/profile_featurize.py [n_reads]
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_reads=200):
    from bench import _write_synthetic_reads
    from deepsignal_tpu.core.config import FeatureConfig
    from deepsignal_tpu.core.constants import (encode_seq, get_motif_seqs,
                                               motif_sites_in_seq)
    from deepsignal_tpu.featurize.central import central_signals_batch
    from deepsignal_tpu.featurize.extractor import (extract_read_features,
                                                    read_features_to_batch)
    from deepsignal_tpu.featurize.signal import (normalize_signals,
                                                 rescale_signals,
                                                 segment_stats)
    from deepsignal_tpu.io.fast5 import get_fast5s, read_resquiggled_fast5

    cfg = FeatureConfig()
    motifs = get_motif_seqs(cfg.motifs, cfg.is_dna)
    tmp = tempfile.mkdtemp(prefix="prof_feat_")
    n_sites = _write_synthetic_reads(tmp, n_reads=n_reads, seed=7)
    files = get_fast5s(tmp)
    t = {}

    def clock(name, fn, per_read_args):
        t0 = time.perf_counter()
        out = [fn(*a) for a in per_read_args]
        t[name] = time.perf_counter() - t0
        return out

    reads = clock("h5_decode", read_resquiggled_fast5, [(f,) for f in files])

    norms = clock("normalize_mad",
                  lambda r: normalize_signals(
                      rescale_signals(r.raw_signal, r.scaling, r.offset),
                      cfg.normalize_method),
                  [(r,) for r in reads])

    stats = clock("segment_stats",
                  lambda r, nm: segment_stats(nm, r.event_starts,
                                              r.event_lengths),
                  list(zip(reads, norms)))

    codes = clock("encode_seq", lambda r: encode_seq(r.seq, True),
                  [(r,) for r in reads])
    locs = clock("motif_scan",
                 lambda c: motif_sites_in_seq(c, motifs, 0, True),
                 [(c,) for c in codes])

    nb = (cfg.kmer_len - 1) // 2

    def gather(r, c, lo, st):
        lo = lo[(lo >= nb) & (lo < c.shape[0] - nb)]
        win = lo[:, None] + np.arange(-nb, nb + 1)[None, :]
        return c[win], st[0][win], st[1][win], r.event_lengths[win], win

    wins = clock("window_gather", gather,
                 list(zip(reads, codes, locs, stats)))

    cents = clock("central_signals",
                  lambda r, nm, w: central_signals_batch(
                      nm, r.event_starts, r.event_lengths, w[4],
                      cfg.cent_signals_len, None),
                  list(zip(reads, norms, wins)))
    del cents

    # whole path through the production function + packing
    t0 = time.perf_counter()
    feats = [extract_read_features(r, motifs, cfg) for r in reads]
    t["extract_read_features(all)"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    fb = read_features_to_batch([f for f in feats if f is not None])
    t["pack_FeatureBatch"] = time.perf_counter() - t0

    total_staged = sum(v for k, v in t.items()
                       if k not in ("extract_read_features(all)",
                                    "pack_FeatureBatch"))
    print(f"\n{n_reads} reads, {len(fb)} sites "
          f"({len(fb)/n_reads:.0f} sites/read)")
    for k, v in sorted(t.items(), key=lambda kv: -kv[1]):
        print(f"  {k:28s} {v*1e3:8.1f} ms  "
              f"({v/n_reads*1e3:6.3f} ms/read)")
    full = t["extract_read_features(all)"] + t["h5_decode"] \
        + t["pack_FeatureBatch"]
    print(f"  staged sum (excl full path)  {total_staged*1e3:8.1f} ms")
    print(f"\nimplied worker rate (h5+extract+pack): "
          f"{len(fb)/full:,.0f} sites/s")
    assert n_sites >= len(fb) * 0.9
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200)
