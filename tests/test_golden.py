"""Golden-file regression test: the featurizer's exact TSV output is pinned.

The fixture fast5 is generated deterministically (seed 424242) and the
expected 12-column TSV lives at tests/golden/features_golden.tsv.  Any change
to normalization, segment stats, coordinate math, central-signal selection,
or row formatting shows up as a byte diff here.

Regenerate (after an INTENTIONAL semantic change only):
    python tests/test_golden.py --regen
"""

import os
import sys

import numpy as np

from deepsignal_tpu.core.config import FeatureConfig
from deepsignal_tpu.core.constants import get_motif_seqs
from deepsignal_tpu.featurize.extractor import extract_fast5_batch
from deepsignal_tpu.io.fast5 import write_synthetic_fast5

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "features_golden.tsv")


def _make_fixture(tmpdir: str) -> list:
    rng = np.random.default_rng(424242)
    paths = []
    genome = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 3000)])
    for i, strand in enumerate(["+", "-", "+"]):
        start = 700 * i
        seq = genome[start:start + 250]
        lengths = rng.integers(3, 22, size=len(seq))
        starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
        raw = rng.integers(380, 920,
                           size=int(lengths.sum()) + 7).astype(np.int16)
        p = os.path.join(tmpdir, f"g{i}.fast5")
        write_synthetic_fast5(p, read_id=f"golden-{i}", raw_signal=raw,
                              event_starts_rel=starts,
                              event_lengths=lengths, seq=seq,
                              mapped_chrom="chrG", mapped_start=start,
                              mapped_strand=strand,
                              read_start_rel_to_raw=4)
        paths.append(p)
    return paths


def _extract_rows(tmpdir: str) -> list:
    paths = _make_fixture(tmpdir)
    cfg = FeatureConfig(central_sample_seed=99)
    feats, errors = extract_fast5_batch(sorted(paths),
                                        get_motif_seqs("CG"), cfg,
                                        chrom2len={"chrG": 3000})
    assert errors == 0
    return [r for f in feats for r in f.to_tsv_rows()]


def test_featurizer_output_matches_golden(tmp_path):
    rows = _extract_rows(str(tmp_path))
    assert rows, "fixture produced no rows"
    want = open(GOLDEN).read().splitlines()
    assert len(rows) == len(want), \
        f"row count changed: {len(rows)} vs golden {len(want)}"
    for i, (got, exp) in enumerate(zip(rows, want)):
        assert got == exp, f"row {i} differs:\n got: {got}\n exp: {exp}"


if __name__ == "__main__":
    if "--regen" in sys.argv:
        import tempfile
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with tempfile.TemporaryDirectory() as td:
            rows = _extract_rows(td)
        with open(GOLDEN, "w") as f:
            f.write("\n".join(rows) + "\n")
        print(f"wrote {len(rows)} golden rows to {GOLDEN}")
