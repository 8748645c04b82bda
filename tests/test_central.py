"""Central-signal rule: flat-path implementation vs the reference-shaped
list implementation (deepsignal/extract_features.py:154-190)."""

import random

import numpy as np

from deepsignal_tpu.featurize.central import (central_signals_flat,
                                              get_central_signals)


def _make_window(rng, k, lengths):
    """Build (norm_signals, starts, lens, signals_list) for one k-mer window."""
    lengths = np.asarray(lengths, dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    sig = np.around(rng.normal(0, 1, size=int(lengths.sum())), 6)
    slist = [sig[starts[i]:starts[i] + lengths[i]] for i in range(k)]
    return sig, starts, lengths, slist


def test_pad_when_short(rng):
    sig, starts, lens, slist = _make_window(rng, 17, [3] * 17)  # 51 < 360
    want = get_central_signals(slist, 360)
    got = central_signals_flat(sig, starts, lens, 360)
    assert got.shape == (360,)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got[51:], 0.0)


def test_balanced_split(rng):
    lens = [30] * 8 + [20] + [30] * 8  # total 500 >= 360, mid=20
    sig, starts, lens, slist = _make_window(rng, 17, lens)
    want = get_central_signals(slist, 360)
    got = central_signals_flat(sig, starts, lens, 360)
    np.testing.assert_array_equal(got, want)


def test_left_clamp(rng):
    # little signal on the left -> right side takes the slack
    lens = [2] * 8 + [100] + [40] * 8
    sig, starts, lens, slist = _make_window(rng, 17, lens)
    np.testing.assert_array_equal(
        central_signals_flat(sig, starts, lens, 360),
        get_central_signals(slist, 360))


def test_right_clamp(rng):
    lens = [40] * 8 + [100] + [2] * 8
    sig, starts, lens, slist = _make_window(rng, 17, lens)
    np.testing.assert_array_equal(
        central_signals_flat(sig, starts, lens, 360),
        get_central_signals(slist, 360))


def test_oversized_middle_base_seeded(rng):
    # middle base alone >= 360 -> sorted random subsample; same seed => same pick
    lens = [5] * 8 + [500] + [5] * 8
    sig, starts, lens, slist = _make_window(rng, 17, lens)
    want = get_central_signals(slist, 360, rng=random.Random(99))
    got = central_signals_flat(sig, starts, lens, 360, rng=random.Random(99))
    np.testing.assert_array_equal(got, want)
    # subsample preserves order (sorted indices)
    mid = slist[8]
    idx = np.searchsorted(np.cumsum([len(s) for s in slist[:8]]), 0)
    del idx
    assert got.shape == (360,)


def test_exact_fit(rng):
    lens = [20] * 8 + [40] + [20] * 8  # total 360 exactly
    sig, starts, lens, slist = _make_window(rng, 17, lens)
    np.testing.assert_array_equal(
        central_signals_flat(sig, starts, lens, 360),
        get_central_signals(slist, 360))


def test_many_random_cases_match(rng):
    pyrng = random.Random(0)
    for _ in range(100):
        k = 17
        lens = rng.integers(1, 60, size=k)
        sig, starts, lens, slist = _make_window(rng, k, lens)
        want = get_central_signals(slist, 360, rng=random.Random(5))
        got = central_signals_flat(sig, starts, lens, 360, rng=random.Random(5))
        np.testing.assert_array_equal(got, want)
    del pyrng
