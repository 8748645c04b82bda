"""Signal math vs reference semantics (deepsignal/extract_features.py:143-212).

The MAD oracle reproduces statsmodels.robust.mad = median(|x-med|)/Phi^-1(0.75)
(SURVEY.md §2.4)."""

import numpy as np
import pytest

from deepsignal_tpu.featurize.signal import (
    MAD_SCALE, normalize_signals, rescale_signals, segment_stats)


def test_mad_scale_constant():
    # Phi^{-1}(0.75), the statsmodels Gaussian-consistency constant
    assert abs(MAD_SCALE - 0.6744897501960817) < 1e-15


def test_rescale():
    raw = np.array([10, 20, 30], dtype=np.int16)
    out = rescale_signals(raw, scaling=0.5, offset=2.0)
    assert out.dtype == np.float64
    np.testing.assert_allclose(out, [6.0, 11.0, 16.0])


def test_normalize_mad_oracle(rng):
    x = rng.normal(100, 20, size=5001)
    got = normalize_signals(x, "mad")
    med = np.median(x)
    scale = np.median(np.abs(x - med)) / MAD_SCALE
    want = np.around((x - med) / scale, decimals=6)
    np.testing.assert_array_equal(got, want)


def test_normalize_zscore_oracle(rng):
    x = rng.normal(0, 5, size=2000)
    got = normalize_signals(x, "zscore")
    want = np.around((x - np.mean(x)) / float(np.std(x)), decimals=6)
    np.testing.assert_array_equal(got, want)


def test_normalize_rejects_bad_method():
    with pytest.raises(ValueError):
        normalize_signals(np.ones(4), "minmax")


def test_segment_stats_matches_per_slice(rng):
    # oracle = the reference's per-slice np.mean/np.std (extract_features.py:273-274)
    n_events = 200
    lengths = rng.integers(1, 30, size=n_events)
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    sig = np.around(rng.normal(0, 1, size=int(lengths.sum())), 6)
    means, stds = segment_stats(sig, starts, lengths)
    for i in range(n_events):
        sl = sig[starts[i]:starts[i] + lengths[i]]
        assert abs(means[i] - np.mean(sl)) < 1e-9
        assert abs(stds[i] - np.std(sl)) < 1e-9


def test_segment_stats_last_segment_to_end():
    sig = np.array([1.0, 2.0, 3.0, 4.0])
    means, stds = segment_stats(sig, np.array([0, 2]), np.array([2, 2]))
    np.testing.assert_allclose(means, [1.5, 3.5])
    np.testing.assert_allclose(stds, [0.5, 0.5])


def test_segment_stats_validates():
    sig = np.zeros(10)
    with pytest.raises(ValueError):
        segment_stats(sig, np.array([0]), np.array([11]))
    with pytest.raises(ValueError):
        segment_stats(sig, np.array([0]), np.array([0]))
