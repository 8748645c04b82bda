"""Alphabet/motif helpers vs plain reference-semantics oracles
(reference: deepsignal/utils/process_utils.py:12-143)."""

import numpy as np
import pytest

from deepsignal_tpu.core.constants import (
    complement_seq, encode_seq, decode_seq, get_motif_seqs,
    motif_sites_in_seq, str2bool)


def _oracle_motif_scan(seqstr, motifset, methyloc=0):
    """Direct port of get_refloc_of_methysite_in_motif (process_utils.py:95-110)."""
    motifset = set(motifset)
    motiflen = len(list(motifset)[0])
    return [i + methyloc for i in range(len(seqstr) - motiflen + 1)
            if seqstr[i:i + motiflen] in motifset]


def test_str2bool():
    assert str2bool("yes") and str2bool("TRUE") and str2bool("t") and str2bool("1")
    assert not str2bool("no") and not str2bool("0") and not str2bool("false")


def test_complement():
    assert complement_seq("ACGT") == "ACGT"
    assert complement_seq("AACCG") == "CGGTT"
    assert complement_seq("ANX") == "NNT"  # unknown -> N
    assert complement_seq("ACGU", "RNA") == "ACGU"


def test_encode_decode_roundtrip():
    s = "ACGTNACGT"
    codes = encode_seq(s)
    assert decode_seq(codes) == s
    assert list(encode_seq("AXZ")) == [0, 4, 4]  # unknowns -> N code


def test_motif_expansion_cg():
    assert get_motif_seqs("CG") == ["CG"]


def test_motif_expansion_iupac():
    # H = A/C/T -> CHH expands to 9 motifs
    seqs = get_motif_seqs("CHH")
    assert len(seqs) == 9
    assert set(seqs) == {f"C{a}{b}" for a in "ACT" for b in "ACT"}
    # multi-motif comma syntax
    assert set(get_motif_seqs("CG,GC")) == {"CG", "GC"}
    # RNA alphabet
    assert set(get_motif_seqs("Y", is_dna=False)) == {"C", "U"}


def test_motif_scan_matches_oracle():
    rng = np.random.default_rng(7)
    bases = np.array(list("ACGT"))
    for motifs in (["CG"], ["GATC"], get_motif_seqs("CHH")):
        for _ in range(20):
            seq = "".join(bases[rng.integers(0, 4, size=rng.integers(5, 300))])
            got = motif_sites_in_seq(seq, motifs, 0).tolist()
            assert got == _oracle_motif_scan(seq, motifs, 0)


def test_motif_scan_mod_loc():
    sites = motif_sites_in_seq("AGATCA", ["GATC"], 1)
    assert sites.tolist() == [2]  # A of GATC at index 1+1


def test_motif_scan_n_in_read_never_matches():
    assert motif_sites_in_seq("ANGCG", ["NG"], 0).tolist() == \
        _oracle_motif_scan("ANGCG", ["NG"], 0)


def test_motif_len_mismatch_raises():
    with pytest.raises(ValueError):
        motif_sites_in_seq("ACGT", ["CG", "GATC"], 0)
