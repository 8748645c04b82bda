"""Native C++ feature parser vs the pure-Python path."""

import numpy as np
import pytest

pytest.importorskip("deepsignal_tpu._fastparse")

from deepsignal_tpu import _fastparse  # noqa: E402
from deepsignal_tpu.io import feature_codec  # noqa: E402


def _rows(rng, n, k=17, s=360):
    bases = np.array(list("ACGT"))
    rows = []
    for i in range(n):
        kmer = "".join(bases[rng.integers(0, 4, k)])
        means = np.around(rng.normal(0, 1, k), 6)
        stds = np.around(np.abs(rng.normal(0, 1, k)), 6)
        lens = rng.integers(1, 50, k)
        cent = np.around(rng.normal(0, 1, s), 6)
        rows.append("\t".join(
            ["chr1", str(i), "+" if i % 2 == 0 else "-", str(i),
             f"read-{i // 4}", "t", kmer,
             ",".join(str(x) for x in means),
             ",".join(str(x) for x in stds),
             ",".join(str(int(x)) for x in lens),
             ",".join(str(x) for x in cent), str(i % 2)]))
    return rows


def _python_parse(lines):
    """Force the pure-Python path regardless of the built extension."""
    saved = feature_codec._native
    feature_codec._native = None
    try:
        return feature_codec.parse_feature_lines(lines)
    finally:
        feature_codec._native = saved


def test_native_matches_python(rng):
    rows = _rows(rng, 50)
    native = feature_codec.parse_feature_lines(rows)
    python = _python_parse(rows)
    assert native.sampleinfo == python.sampleinfo
    np.testing.assert_array_equal(native.kmers, python.kmers)
    np.testing.assert_array_equal(native.means, python.means)
    np.testing.assert_array_equal(native.stds, python.stds)
    np.testing.assert_array_equal(native.lens, python.lens)
    np.testing.assert_array_equal(native.signals, python.signals)
    np.testing.assert_array_equal(native.labels, python.labels)


def test_native_handles_negative_and_exponent(rng):
    row = "\t".join(
        ["chrX", "42", "-", "-1", "r0", "t", "ACGTN",
         "-1.5,2e-3,0.0,-0.000001,3.25",
         "0.1,0.2,0.3,0.4,0.5", "1,2,3,4,5",
         ",".join(["-0.5"] * 8), "0"])
    fb = feature_codec.parse_feature_lines([row], kmer_len=5, signal_len=8)
    assert fb.sampleinfo[0] == "chrX\t42\t-\t-1\tr0\tt"
    np.testing.assert_allclose(fb.means[0],
                               [-1.5, 2e-3, 0.0, -0.000001, 3.25])
    assert fb.kmers[0].tolist() == [0, 1, 2, 3, 4]
    assert fb.labels[0] == 0


def test_native_rejects_malformed():
    with pytest.raises(ValueError):
        _fastparse.parse_feature_block(b"only\tthree\tcols\n", 5, 8)


def test_native_speedup(rng):
    import time
    rows = _rows(rng, 2000)
    t = time.time()
    feature_codec.parse_feature_lines(rows)
    native_t = time.time() - t
    t = time.time()
    _python_parse(rows)
    python_t = time.time() - t
    # sanity: native should never be slower (usually 5-10x faster)
    assert native_t < python_t
