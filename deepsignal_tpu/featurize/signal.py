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

# scipy.stats.norm.ppf(0.75): the statsmodels `robust.mad` denominator.
MAD_SCALE = 0.6744897501960817


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
        med = np.median(signals)
        sshift, sscale = med, float(np.median(np.abs(signals - med)) / MAD_SCALE)
    else:
        raise ValueError("normalize_method must be 'mad' or 'zscore'")
    norm = (signals - sshift) / sscale
    return np.around(norm, decimals=6)


def segment_stats(norm_signals: np.ndarray, starts: np.ndarray,
                  lengths: np.ndarray):
    """Per-event mean/std over ``norm_signals[starts[i] : starts[i]+lengths[i]]``.

    Vectorized with ``np.add.reduceat`` (O(N) in total signal length) —
    replaces the per-site Python loops of extract_features.py:273-274.
    Returns (means, stds) float64 arrays of shape [num_events].

    Note on determinism: the reference calls np.mean/np.std per slice (pairwise
    summation); reduceat sums sequentially.  Differences are O(eps * seg_len)
    — far below the 1e-6 rounding applied before output.
    """
    starts = np.asarray(starts, dtype=np.int64)
    lengths = np.asarray(lengths, dtype=np.int64)
    n = norm_signals.shape[0]
    ends = starts + lengths
    if lengths.min(initial=1) <= 0:
        raise ValueError("all event lengths must be positive")
    if ends.max(initial=0) > n:
        raise ValueError("event extends past end of signal")

    # reduceat over interleaved [start, end) boundaries: even entries are the
    # per-segment sums.  reduceat needs indices < n; an end index == n is
    # handled by summing a trailing dummy and masking (we append a zero).
    sig = np.concatenate([norm_signals, np.zeros(1, dtype=norm_signals.dtype)])
    sig2 = sig * sig
    bounds = np.empty(starts.shape[0] * 2, dtype=np.int64)
    bounds[0::2] = starts
    bounds[1::2] = ends
    # indices passed to reduceat must be strictly within the array
    seg_sums = np.add.reduceat(sig, bounds)[0::2]
    seg_sums2 = np.add.reduceat(sig2, bounds)[0::2]
    # a bound pair (s, e) with e == len(sig)-1 sums sig[s:e]; pairs where
    # e == s would mis-sum but lengths are validated positive above.
    means = seg_sums / lengths
    variances = seg_sums2 / lengths - means * means
    stds = np.sqrt(np.maximum(variances, 0.0))
    return means, stds
