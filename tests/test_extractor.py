"""End-to-end featurizer vs a plain-Python oracle that follows the reference
logic literally (deepsignal/extract_features.py:215-303)."""

import random

import numpy as np
import pytest

from deepsignal_tpu.core.config import FeatureConfig
from deepsignal_tpu.core.constants import get_motif_seqs
from deepsignal_tpu.featurize.central import get_central_signals
from deepsignal_tpu.featurize.extractor import (extract_fast5_batch,
                                                extract_read_features,
                                                read_position_file)
from deepsignal_tpu.featurize.signal import normalize_signals, rescale_signals
from deepsignal_tpu.io.fast5 import (get_fast5s, read_resquiggled_fast5,
                                     write_synthetic_fast5)

KMER = 17
NB = (KMER - 1) // 2


def _synth_read(rng, n_events=120, seed_seq=None, strand="+"):
    """Random resquiggled read description."""
    bases = np.array(list("ACGT"))
    seq = seed_seq or "".join(bases[rng.integers(0, 4, n_events)])
    lengths = rng.integers(3, 25, size=len(seq))
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    total = int(lengths.sum())
    raw = rng.integers(400, 900, size=total + 10).astype(np.int16)
    return dict(seq=seq, lengths=lengths, starts=starts, raw=raw,
                strand=strand)


def _write_f5(tmp_path, name, d, chrom="chrI", mapped_start=1000,
              read_id="rid-1", rel=5):
    path = str(tmp_path / name)
    write_synthetic_fast5(
        path, read_id=read_id, raw_signal=d["raw"],
        event_starts_rel=d["starts"], event_lengths=d["lengths"],
        seq=d["seq"], mapped_chrom=chrom, mapped_start=mapped_start,
        mapped_strand=d["strand"], read_start_rel_to_raw=rel)
    return path


def _oracle_features(d, motif_seqs, chrom, mapped_start, chromlen,
                     cfg, rid, rel, rng_central):
    """Literal re-statement of _extract_features (extract_features.py:215-286)."""
    scaling = 1402.882 / 8192.0
    offset = 6.0
    raw = rescale_signals(d["raw"], scaling, offset)
    norm = normalize_signals(raw, cfg.normalize_method)
    genomeseq = d["seq"]
    signal_list = [norm[rel + s: rel + s + l]
                   for s, l in zip(d["starts"], d["lengths"])]
    motifset = set(motif_seqs)
    mlen = len(motif_seqs[0])
    tsites = [i + cfg.mod_loc for i in range(len(genomeseq) - mlen + 1)
              if genomeseq[i:i + mlen] in motifset]
    rows = []
    for loc in tsites:
        if not (NB <= loc < len(genomeseq) - NB):
            continue
        if d["strand"] == "-":
            pos = mapped_start + len(genomeseq) - 1 - loc
            pis = chromlen - 1 - pos if chromlen is not None else -1
        else:
            pos = mapped_start + loc
            pis = pos if chromlen is not None else -1
        k_mer = genomeseq[loc - NB: loc + NB + 1]
        k_sig = signal_list[loc - NB: loc + NB + 1]
        means = [np.mean(x) for x in k_sig]
        stds = [np.std(x) for x in k_sig]
        lens = [len(x) for x in k_sig]
        cent = get_central_signals(k_sig, cfg.cent_signals_len, rng_central)
        rows.append((chrom, pos, d["strand"], pis, rid, "t", k_mer,
                     means, stds, lens, cent, cfg.methy_label))
    return rows


@pytest.mark.parametrize("strand", ["+", "-"])
def test_extract_matches_oracle(tmp_path, rng, strand):
    cfg = FeatureConfig(central_sample_seed=77)
    d = _synth_read(rng, n_events=150, strand=strand)
    path = _write_f5(tmp_path, "a.fast5", d)
    chromlen = 50000

    read = read_resquiggled_fast5(path)
    assert read is not None
    assert read.read_id == "rid-1"
    feats = extract_read_features(read, get_motif_seqs("CG"), cfg,
                                  {"chrI": chromlen},
                                  rng=random.Random(31))
    want = _oracle_features(d, get_motif_seqs("CG"), "chrI", 1000, chromlen,
                            cfg, "rid-1", 5, random.Random(31))
    if feats is None:
        assert want == []
        return
    assert len(feats) == len(want)
    for i, w in enumerate(want):
        assert int(feats.pos[i]) == w[1]
        assert int(feats.pos_in_strand[i]) == w[3]
        kmer_str = "".join("ACGTN"[c] for c in feats.kmers[i])
        assert kmer_str == w[6]
        np.testing.assert_allclose(feats.means[i], w[7], atol=1e-9)
        np.testing.assert_allclose(feats.stds[i], w[8], atol=1e-9)
        assert feats.lens[i].tolist() == w[9]
        np.testing.assert_array_equal(feats.cent_signals[i], w[10])


def test_tsv_rows_format(tmp_path, rng):
    cfg = FeatureConfig()
    d = _synth_read(rng, n_events=80)
    path = _write_f5(tmp_path, "b.fast5", d)
    read = read_resquiggled_fast5(path)
    feats = extract_read_features(read, ["CG"], cfg, None)
    if feats is None:
        pytest.skip("no CG site in random seq")
    rows = feats.to_tsv_rows()
    words = rows[0].split("\t")
    assert len(words) == 12
    assert words[0] == "chrI"
    assert words[3] == "-1"  # no reference -> pos_in_strand = -1
    assert words[5] == "t"
    assert len(words[6]) == 17
    assert len(words[7].split(",")) == 17
    assert len(words[10].split(",")) == 360
    assert words[11] == "1"


def test_positions_filter(tmp_path, rng):
    cfg = FeatureConfig()
    d = _synth_read(rng, n_events=100)
    path = _write_f5(tmp_path, "c.fast5", d)
    read = read_resquiggled_fast5(path)
    all_feats = extract_read_features(read, ["CG"], cfg, None)
    if all_feats is None or len(all_feats) < 2:
        pytest.skip("need >=2 sites")
    keep_pos = int(all_feats.pos[0])
    posfile = tmp_path / "pos.tsv"
    posfile.write_text(f"chrI\t{keep_pos}\t+\n")
    positions = read_position_file(str(posfile))
    filt = extract_read_features(read, ["CG"], cfg, None, positions=positions)
    assert len(filt) == 1
    assert int(filt.pos[0]) == keep_pos


def test_batch_fault_isolation(tmp_path, rng):
    cfg = FeatureConfig()
    d = _synth_read(rng, n_events=90)
    good = _write_f5(tmp_path, "good.fast5", d)
    bad = tmp_path / "bad.fast5"
    bad.write_bytes(b"not an hdf5 file")
    feats, errors = extract_fast5_batch([good, str(bad)], ["CG"], cfg)
    assert errors == 1
    assert len(feats) <= 1


def test_get_fast5s_discovery(tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "x.fast5").write_bytes(b"")
    (tmp_path / "sub" / "y.fast5").write_bytes(b"")
    (tmp_path / "z.txt").write_bytes(b"")
    assert len(get_fast5s(str(tmp_path), True)) == 2
    assert len(get_fast5s(str(tmp_path), False)) == 1


def test_reader_error_semantics(tmp_path, rng):
    """The low-level fast5 reader must keep the reference's fault contract
    (extract_features.py:136-140, 281-283): missing Alignment (or the whole
    corrected group) -> None (skipped silently); missing Events or Raw with
    the Alignment present -> an exception the batch loop counts as an
    error."""
    import shutil

    import h5py

    d = _synth_read(rng, n_events=60)
    base = _write_f5(tmp_path, "base.fast5", d)
    strand = "Analyses/RawGenomeCorrected_000/BaseCalled_template"

    def variant(name, delete):
        p = tmp_path / name
        shutil.copy(base, p)
        with h5py.File(p, "a") as h5:
            del h5[delete]
        return str(p)

    assert read_resquiggled_fast5(
        variant("noalign.fast5", strand + "/Alignment")) is None
    assert read_resquiggled_fast5(
        variant("nogroup.fast5", "Analyses")) is None
    with pytest.raises(RuntimeError, match="events not found"):
        read_resquiggled_fast5(variant("noevents.fast5", strand + "/Events"))
    with pytest.raises(RuntimeError, match="Raw data"):
        read_resquiggled_fast5(variant("noraw.fast5", "Raw"))
    with pytest.raises(Exception):
        read_resquiggled_fast5(str(tmp_path / "missing.fast5"))
    assert read_resquiggled_fast5(base) is not None
