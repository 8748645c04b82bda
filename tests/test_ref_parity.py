"""Cross-implementation featurizer parity: run the REFERENCE extractor
(/root/reference/deepsignal/extract_features.py) in-process on synthetic
fixtures and byte-compare its feature rows with ours.

The reference needs two shims on this image: ``statsmodels.robust.mad``
(stubbed with the exact statsmodels formula — median(|x - median(x)| / c),
c = scipy norm.ppf(0.75)) and the ``np.float``/``np.int`` aliases removed in
NumPy 2.0.  Everything else runs verbatim, so a byte diff here means OUR
semantics drifted from the reference's (normalization, segment stats,
coordinate math, central-signal rule, or row formatting).
"""

import os
import sys
import types

import numpy as np
import pytest

from deepsignal_tpu.core.config import FeatureConfig
from deepsignal_tpu.core.constants import get_motif_seqs
from deepsignal_tpu.featurize.extractor import (extract_fast5_batch,
                                                read_position_file)
from tests.test_golden import GOLDEN, _make_fixture

REF_ROOT = "/root/reference"
CORR = "RawGenomeCorrected_000"
SUB = "BaseCalled_template"


@pytest.fixture(scope="module")
def ref_ef():
    if not os.path.isdir(os.path.join(REF_ROOT, "deepsignal")):
        pytest.skip("reference checkout not available")
    if "statsmodels" not in sys.modules:
        sm = types.ModuleType("statsmodels")
        rb = types.ModuleType("statsmodels.robust")
        C = 0.6744897501960817  # scipy.stats.norm.ppf(0.75)

        def mad(a, c=C, axis=0, center=np.median):
            a = np.asarray(a)
            return np.median(np.abs(a - center(a)) / c, axis=axis)

        rb.mad = mad
        sm.robust = rb
        sys.modules["statsmodels"] = sm
        sys.modules["statsmodels.robust"] = rb
    # NumPy 2.0 removed the deprecated aliases the reference uses
    # (extract_features.py:67,145-147,212)
    np.float = float
    np.int = int
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import deepsignal.extract_features as ref_ef  # noqa: E402
    return ref_ef


def _ref_rows(ref_ef, paths, motif_seqs, chrom2len, normalize="mad",
              kmer_len=17, positions=None, methy_label=1):
    feats, err = ref_ef._extract_features(
        sorted(paths), CORR, SUB, normalize, motif_seqs, 0, chrom2len,
        kmer_len, 360, methy_label, positions)
    assert err == 0
    return [ref_ef._features_to_str(f) for f in feats]


def _our_rows(paths, motif_seqs, cfg, chrom2len, positions=None):
    feats, errors = extract_fast5_batch(sorted(paths), motif_seqs, cfg,
                                        chrom2len, positions)
    assert errors == 0
    return [r for f in feats for r in f.to_tsv_rows()]


def test_rows_byte_identical_to_reference(ref_ef, tmp_path):
    paths = _make_fixture(str(tmp_path))
    motifs = get_motif_seqs("CG")
    chrom2len = {"chrG": 3000}
    ref = _ref_rows(ref_ef, paths, motifs, chrom2len)
    ours = _our_rows(paths, motifs, FeatureConfig(), chrom2len)
    assert ref, "fixture produced no rows"
    assert ours == ref


def test_golden_file_is_reference_generated(ref_ef, tmp_path):
    """The checked-in golden TSV must be exactly what the reference code
    produces on the fixture (not a self-pinned regression file)."""
    paths = _make_fixture(str(tmp_path))
    ref = _ref_rows(ref_ef, paths, get_motif_seqs("CG"), {"chrG": 3000})
    want = open(GOLDEN).read().splitlines()
    assert ref == want


def test_rows_match_reference_no_genome_zscore(ref_ef, tmp_path):
    """pos_in_strand=-1 path + zscore normalization parity."""
    paths = _make_fixture(str(tmp_path))
    motifs = get_motif_seqs("CG")
    ref = _ref_rows(ref_ef, paths, motifs, None, normalize="zscore")
    ours = _our_rows(paths, motifs,
                     FeatureConfig(normalize_method="zscore"), None)
    assert ours == ref
    assert all(r.split("\t")[3] == "-1" for r in ref)


def test_rows_match_reference_iupac_motif_kmer9(ref_ef, tmp_path):
    """Alternate motif grammar (IUPAC expansion) + kmer_len parity."""
    paths = _make_fixture(str(tmp_path))
    motifs = get_motif_seqs("CHG")  # H -> A/C/T
    ref = _ref_rows(ref_ef, paths, motifs, {"chrG": 3000}, kmer_len=9)
    ours = _our_rows(paths, motifs, FeatureConfig(kmer_len=9),
                     {"chrG": 3000})
    assert ref
    assert ours == ref


def test_rows_match_reference_positions_filter(ref_ef, tmp_path):
    paths = _make_fixture(str(tmp_path))
    motifs = get_motif_seqs("CG")
    all_rows = _ref_rows(ref_ef, paths, motifs, {"chrG": 3000})
    keep = [all_rows[i].split("\t") for i in range(0, len(all_rows), 3)]
    posfile = tmp_path / "pos.tsv"
    posfile.write_text("".join(f"{w[0]}\t{w[1]}\t{w[2]}\n" for w in keep))
    positions = read_position_file(str(posfile))
    ref = _ref_rows(ref_ef, paths, motifs, {"chrG": 3000},
                    positions=positions)
    ours = _our_rows(paths, motifs, FeatureConfig(), {"chrG": 3000},
                     positions=positions)
    assert len(ref) == len(keep)
    assert ours == ref
