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


# ---------------------------------------------------------------------------
# _featkernel: native normalize + segment stats (bit-exact numpy semantics)
# ---------------------------------------------------------------------------

featkernel = pytest.importorskip("deepsignal_tpu._featkernel")


def _numpy_normalize_mad(x):
    from deepsignal_tpu.featurize.signal import MAD_SCALE
    med = np.median(x)
    sscale = float(np.median(np.abs(x - med) / MAD_SCALE))
    return np.around((x - med) / sscale, decimals=6)


def test_featkernel_normalize_bit_exact(rng):
    for n in (11, 100, 4097, 60000, 60001):
        x = rng.normal(450, 40, n)
        np.testing.assert_array_equal(featkernel.normalize_mad(x),
                                      _numpy_normalize_mad(x))


def test_featkernel_segment_stats_bit_exact(rng):
    lens = rng.integers(1, 200, 500).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    sig = np.around(rng.normal(0, 1, int(lens.sum())), 6)
    means, stds = featkernel.segment_stats(sig, starts, lens)
    want_m = np.array([sig[s:s + l].mean() for s, l in zip(starts, lens)])
    want_s = np.array([sig[s:s + l].std() for s, l in zip(starts, lens)])
    np.testing.assert_array_equal(means, want_m)
    np.testing.assert_array_equal(stds, want_s)


def test_featkernel_segment_stats_bounds(rng):
    sig = rng.normal(0, 1, 100)
    with pytest.raises(ValueError):
        featkernel.segment_stats(sig, np.array([90], np.int64),
                                 np.array([20], np.int64))


def test_signal_module_uses_native_and_matches(rng):
    """The public normalize_signals/segment_stats must equal the pure-numpy
    chain regardless of which backend runs underneath."""
    from deepsignal_tpu.featurize import signal as sigmod
    x = rng.normal(450, 40, 30000)
    got = sigmod.normalize_signals(x, "mad")
    np.testing.assert_array_equal(got, _numpy_normalize_mad(x))
    lens = rng.integers(1, 40, 300).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    m, s = sigmod.segment_stats(got, starts, lens)
    np.testing.assert_array_equal(
        m, np.array([got[a:a + l].mean() for a, l in zip(starts, lens)]))
    np.testing.assert_array_equal(
        s, np.array([got[a:a + l].std() for a, l in zip(starts, lens)]))


def test_format_rows6_byte_identical():
    """Native float formatting must equal python str() byte-for-byte on
    6-decimal-rounded values: fast-path range, both guard boundaries
    (1e-4 scientific switch, 1e9 ulp limit), zeros/signed zeros, and the
    non-finite fallback."""
    nk = pytest.importorskip("deepsignal_tpu._featkernel")
    rng = np.random.default_rng(99)
    parts = [rng.normal(0, 1, 5000), rng.normal(0, 1e-4, 2000),
             rng.uniform(-1e7, 1e7, 2000),
             rng.uniform(1e8, 4e9, 2000) * np.sign(rng.normal(0, 1, 2000)),
             10.0 ** rng.uniform(-10, 12, 3000)
             * np.sign(rng.normal(0, 1, 3000)),
             np.array([0.0, -0.0, 1e-7, -1e-7, 2.0, -3.0, 0.25,
                       np.inf, -np.inf, np.nan, 123.456789, 1e-4, -1e-4])]
    a = np.around(np.concatenate(parts), 6)
    a = a[:len(a) - len(a) % 3].reshape(-1, 3)
    assert nk.format_rows6(a) == [",".join(str(v) for v in row)
                                  for row in a]


# ---------------------------------------------------------------------------
# _featkernel: native call-row formatter (VERDICT r4 #2)
# ---------------------------------------------------------------------------


def test_repr_f32_byte_identical_random_bits():
    """str(np.float32) repr across random bit patterns (covers subnormals,
    nan payloads, infinities, both formatting regimes and their 1e-4/1e16
    boundary) — any digit or layout divergence from numpy's dragon4 fails."""
    rng = np.random.default_rng(2024)
    bits = rng.integers(0, 2**32, 200_000, dtype=np.uint64).astype(np.uint32)
    vals = bits.view(np.float32)
    assert featkernel.repr_f32(vals) == [str(v) for v in vals]


def test_repr_f32_boundaries():
    vals = np.array([0.0, -0.0, 1e-4, 9.9999e-5, 1.0000001e-4, 1e16,
                     9.999999e15, 1e-45, -1.17549435e-38, 3.4e38,
                     np.inf, -np.inf, np.nan, 0.5, 2 / 3], dtype=np.float32)
    assert featkernel.repr_f32(vals) == [str(v) for v in vals]


def test_format_call_block_matches_python(rng):
    from deepsignal_tpu.io import calls_codec
    n, k = 500, 17
    info = [f"chr1\t{i}\t+\t{i}\tread{i // 50}\tt" for i in range(n)]
    p1 = rng.random(n).astype(np.float32)
    p1[:8] = np.array([0.0, 1.0, 1e-7, 0.9999999, 0.5, 1e-38,
                       np.nan, 0.25], dtype=np.float32)
    p0 = np.float32(1.0) - p1
    pred = (p1 > 0.5).astype(np.int64)
    kmers = rng.integers(0, 5, (n, k)).astype(np.int32)
    for is_dna in (True, False):
        native = calls_codec.format_call_block(info, p0, p1, pred, kmers,
                                               is_dna)
        python = calls_codec._format_call_block_py(info, p0, p1, pred, kmers,
                                                   is_dna)
        assert native == python


def test_collect_block_equals_collect_rows(rng):
    """The drain path's bytes block must be byte-identical to joining the
    per-row ``collect`` output on the same handle."""
    from deepsignal_tpu.core.config import ModelConfig
    from deepsignal_tpu.io.feature_codec import FeatureBatch
    from deepsignal_tpu.models.deepsignal import init_model
    from deepsignal_tpu.runtime.caller import ModCaller

    cfg = ModelConfig(lstm_hidden=16, inception_times=1,
                      inception_blocks=(1, 0, 0))
    _, variables = init_model(cfg, batch_size=4)
    n = 37
    fb = FeatureBatch(
        sampleinfo=[f"chr1\t{i}\t+\t{i}\tread{i // 9}\tt" for i in range(n)],
        kmers=rng.integers(0, 4, (n, 17)).astype(np.int32),
        means=rng.normal(0, 1, (n, 17)).astype(np.float32),
        stds=np.abs(rng.normal(0, 1, (n, 17))).astype(np.float32),
        lens=rng.integers(1, 40, (n, 17)).astype(np.int64),
        signals=rng.normal(0, 1, (n, 360)).astype(np.float32),
        labels=np.ones(n, dtype=np.int32))
    caller = ModCaller(cfg, variables, batch_size=16)
    handle = caller.dispatch_feature_batch(fb)
    rows, pred_r, (p0_r, p1_r) = caller.collect(handle)
    block, pred_b, (p0_b, p1_b) = caller.collect_block(handle)
    assert block == "".join(r + "\n" for r in rows).encode()
    np.testing.assert_array_equal(pred_r, pred_b)
    np.testing.assert_array_equal(p0_r, p0_b)


def test_count_read_runs_native_matches_python(rng):
    from deepsignal_tpu.io import calls_codec
    reads = [f"read{i}" for i in rng.integers(0, 12, 300)]
    info = [f"chr1\t{i}\t+\t{i}\t{r}\tt" for i, r in enumerate(reads)]
    native = calls_codec.count_read_runs(info)
    saved = calls_codec._native
    calls_codec._native = None
    try:
        python = calls_codec.count_read_runs(info)
    finally:
        calls_codec._native = saved
    assert native == python
    # structural check: runs == number of adjacent-name changes + 1
    expect = 1 + sum(1 for a, b in zip(reads, reads[1:]) if a != b)
    assert native[0] == expect
    assert native[1] == reads[0] and native[2] == reads[-1]
    assert calls_codec.count_read_runs([]) == (0, "", "")


def test_native_call_formatter_actually_engaged():
    """Guard against silent self-check failure: with a functional extension
    present, calls_codec must be USING it (a swallowed import-time
    exception once disabled the native path while every native-vs-python
    test passed vacuously, both sides running Python)."""
    from deepsignal_tpu.io import calls_codec
    assert hasattr(featkernel, "format_call_block")
    assert calls_codec._native is not None, (
        "native call-row formatter silently disabled at import")
