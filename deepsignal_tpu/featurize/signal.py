"""Raw-signal math: pA rescaling, read-level normalization, segment stats.

Semantics pinned to the reference:

- pA rescale = ``scaling * (raw + offset)`` with ``scaling = range /
  digitisation`` (extract_features.py:193-212).
- MAD normalization uses the *Gaussian-consistent scaled* MAD exactly as
  ``statsmodels.robust.mad``: ``median(|x - median(x)|) / 0.6744897501960817``
  (extract_features.py:147; SURVEY.md §2.4).
- Normalized signals are rounded to 6 decimals (extract_features.py:151).
- Per-base segment means/stds use population statistics (np.mean/np.std with
  ddof=0, extract_features.py:273-274); here computed with O(N) vectorized
  prefix sums over the whole read instead of a Python loop per site.
"""

from __future__ import annotations

import numpy as np

try:  # native kernels (deepsignal_tpu/native/featkernel.cpp), bit-exact
    from .. import _featkernel as _native
except ImportError:  # pragma: no cover - build-dependent
    _native = None

# scipy.stats.norm.ppf(0.75): the statsmodels `robust.mad` denominator.
MAD_SCALE = 0.6744897501960817


def _native_selfcheck() -> bool:
    """Probe the native kernels against the numpy chain at import time.

    The native segment-stats pass replicates numpy's *pairwise* summation
    blocking; a numpy built with a different SIMD lane-accumulation order
    would diverge in the last ulp — enough to flip the 6-decimal rounding.
    Build-time assumptions are not trusted: mean/std/median are compared
    bit-for-bit on probe segments covering every pairwise-blocking regime
    (n<=8 unrolled, 8<n<=128 blocked, n>128 recursive) and the native path
    is disabled on ANY mismatch (ADVICE r3)."""
    rng = np.random.RandomState(12345)
    lengths = np.array([1, 2, 7, 8, 9, 16, 100, 129, 1000, 4096],
                       dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    sig = np.round(rng.standard_normal(int(lengths.sum())), 6)

    n_means, n_stds = _native.segment_stats(sig, starts, lengths)
    for i, (s, ln) in enumerate(zip(starts, lengths)):
        seg = sig[s:s + ln]
        if n_means[i] != np.mean(seg) or n_stds[i] != np.std(seg):
            return False

    for ln in (11, 100, 1001):
        x = rng.standard_normal(ln) * 40 + 420
        med = np.median(x)
        scale = float(np.median(np.abs(x - med) / MAD_SCALE))
        expect = np.around((x - med) / scale, decimals=6)
        if not np.array_equal(_native.normalize_mad(x), expect):
            return False

    # format_rows6 must be byte-identical to str() across the fast-path
    # range, its 1e-4 / 1e9 boundaries, and the fallback regimes
    probe = np.around(np.concatenate([
        rng.standard_normal(256),
        rng.standard_normal(64) * 1e-4,
        rng.uniform(1e8, 2e9, 64) * np.where(rng.rand(64) < 0.5, -1, 1),
        np.array([0.0, -0.0, 1e-7, -1e-7, 2.0, 0.25, np.inf, -np.inf,
                  np.nan])]), 6).reshape(-1, 1)
    expect_rows = [",".join(str(v) for v in row) for row in probe]
    return _native.format_rows6(probe) == expect_rows


if _native is not None:
    try:
        if not _native_selfcheck():  # pragma: no cover - host-dependent
            import sys as _sys
            # stderr (not stdout): this fires at import time in every
            # worker, and stdout may be machine-parsed CLI output
            print("warning: native featurize kernels disagree with numpy on "
                  "this host (different pairwise-summation order?); falling "
                  "back to the numpy path", file=_sys.stderr)
            _native = None
    except Exception:  # pragma: no cover - defensive
        _native = None


def rescale_signals(raw_signals: np.ndarray, scaling: float,
                    offset: float) -> np.ndarray:
    """DAC values -> picoamps (extract_features.py:211-212); float64."""
    return np.asarray(scaling * (raw_signals + offset), dtype=np.float64)


def normalize_signals(signals: np.ndarray,
                      normalize_method: str = "mad") -> np.ndarray:
    """Whole-read normalization (extract_features.py:143-151).

    Returns float64 values rounded to 6 decimals, matching the reference's
    ``np.around(..., decimals=6)``.
    """
    signals = np.asarray(signals, dtype=np.float64)
    if normalize_method == "zscore":
        sshift, sscale = np.mean(signals), float(np.std(signals))
    elif normalize_method == "mad":
        if signals.size == 0:
            return signals
        # Fast bit-exact median: numpy's SIMD introselect with a SINGLE kth
        # is ~5x faster than np.median's dual-kth path (measured 0.14 vs
        # 0.81 ms at n=57k); the even-length upper middle is recovered as
        # the min of the right partition.  Values are identical to
        # np.median: the kth order statistic does not depend on the
        # selection algorithm, and the even-length mean is the same
        # (lo + hi) / 2 double op.  (This numpy chain also beats the native
        # C kernel, whose libstdc++ nth_element lacks numpy's SIMD sort —
        # measured 0.7 vs 1.4 ms/read — so the native normalize is no
        # longer preferred; it remains exercised by tests/test_native.py.)
        med = _fast_median(signals)
        # statsmodels.robust.mad divides elementwise by c BEFORE taking the
        # median; mirror that op order for bit-exact parity
        sshift = med
        sscale = float(_fast_median(np.abs(signals - med) / MAD_SCALE))
    else:
        raise ValueError("normalize_method must be 'mad' or 'zscore'")
    norm = (signals - sshift) / sscale
    return np.around(norm, decimals=6)


def _fast_median(x: np.ndarray) -> float:
    """np.median, bit-exact, via one single-kth SIMD partition.

    NaN inputs defer to np.median so NaN propagates (np.partition sorts
    NaNs to the end, which would otherwise yield a finite wrong median);
    unreachable from the featurize path (signals are a linear rescale of
    integer DAC values) but guarded for direct callers."""
    if np.isnan(np.max(x, initial=-np.inf)):  # max propagates NaN; O(n) scan
        return float(np.median(x))
    n = x.shape[0]
    k = (n - 1) // 2
    part = np.partition(x, k)
    if n % 2:
        return float(part[k])
    return float((part[k] + part[k + 1:].min()) / 2.0)


def segment_stats(norm_signals: np.ndarray, starts: np.ndarray,
                  lengths: np.ndarray):
    """Per-event mean/std over ``norm_signals[starts[i] : starts[i]+lengths[i]]``.

    Vectorized replacement for the per-site Python loops of
    extract_features.py:273-274.  Returns (means, stds) float64 arrays of
    shape [num_events].

    Bit-exactness: the reference calls ``np.mean``/``np.std`` on each 1-D
    slice, which numpy reduces with *pairwise* summation.  A sequential
    reduceat sum differs in the last ulp often enough to flip the 6-decimal
    output rounding (~0.06% of values).  Instead we group segments by length,
    gather each group into a C-contiguous [m, L] matrix, and reduce along the
    last axis — numpy applies the identical pairwise routine per row, so the
    results are bit-identical to the reference's per-slice calls while
    remaining one vectorized op per distinct length.
    """
    starts = np.asarray(starts, dtype=np.int64)
    lengths = np.asarray(lengths, dtype=np.int64)
    n = norm_signals.shape[0]
    if lengths.min(initial=1) <= 0:
        raise ValueError("all event lengths must be positive")
    if (starts + lengths).max(initial=0) > n:
        raise ValueError("event extends past end of signal")

    norm_signals = np.ascontiguousarray(norm_signals, dtype=np.float64)
    if _native is not None:
        # native per-segment pass with numpy's exact pairwise-summation
        # order (tests/test_native.py proves bit-equality vs the grouped
        # numpy reduction below)
        return _native.segment_stats(norm_signals, starts, lengths)
    means = np.empty(starts.shape[0], dtype=np.float64)
    stds = np.empty(starts.shape[0], dtype=np.float64)
    for seg_len in np.unique(lengths):
        idx = np.nonzero(lengths == seg_len)[0]
        rows = norm_signals[starts[idx][:, None] + np.arange(seg_len)]
        means[idx] = rows.mean(axis=1)
        stds[idx] = rows.std(axis=1)
    return means, stds
