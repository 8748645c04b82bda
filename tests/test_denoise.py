"""Cross-rank denoise loop end-to-end (denoise.py semantics), tiny scale."""

import os

import numpy as np

from deepsignal_tpu.core.config import DenoiseConfig, ModelConfig
from deepsignal_tpu.train.denoise import clean_samples, denoise

K, S = 5, 24


def _rows(rng, n, noisy_frac=0.3):
    """Positives: half 'true' (separable signal), a noisy_frac mislabeled."""
    bases = np.array(list("ACGT"))
    rows = []
    for i in range(n):
        label = int(rng.integers(0, 2))
        true_signal = label
        if label == 1 and rng.random() < noisy_frac:
            true_signal = 0  # mislabeled positive (noise to be cleaned)
        shift = 1.5 if true_signal else -1.5
        kmer = "".join(bases[rng.integers(0, 4, K)])
        rows.append("\t".join(
            ["chr1", str(i), "+", str(i), f"r{i}", "t", kmer,
             ",".join(str(x) for x in np.around(rng.normal(shift, 0.3, K),
                                                6)),
             ",".join(str(x) for x in np.around(
                 np.abs(rng.normal(0, 0.3, K)), 6)),
             ",".join(str(x) for x in rng.integers(1, 30, K)),
             ",".join(str(x) for x in np.around(rng.normal(shift, 0.3, S),
                                                6)),
             str(label)]))
    return rows


def test_clean_samples_filters_positives(tmp_path):
    f = tmp_path / "t.tsv"
    rows = ["a\tb\t1", "c\td\t1", "e\tf\t0", "g\th\t1"]
    f.write_text("\n".join(rows) + "\n")
    idx2probs = {0: [0.9, 0.8], 1: [0.2], 2: [0.9], 3: [0.7]}
    clean_pos, ratio = clean_samples(str(f), idx2probs, score_cf=0.5)
    kept = open(clean_pos).read().splitlines()
    # positives at lines 0 and 3 have mean prob > 0.5; line 1 dropped;
    # line 2 is a negative (never kept here)
    assert kept == ["a\tb\t1", "g\th\t1"]
    assert abs(ratio - 2 / 3) < 1e-9


def test_denoise_end_to_end(tmp_path, rng):
    train_f = str(tmp_path / "train.tsv")
    with open(train_f, "w") as f:
        f.write("\n".join(_rows(rng, 120)) + "\n")
    mcfg = ModelConfig(lstm_hidden=8, lstm_layers=1, inception_times=1,
                       inception_blocks=(1, 1, 1), cent_signals_len=S,
                       kmer_len=K, is_cnn=False, is_base=False)
    dcfg = DenoiseConfig(iterations=1, epoch_num=1, rounds=1,
                         batch_size=16, step_interval=2,
                         is_cnn=False, is_base=False, is_rnn=True)
    out = denoise(train_f, mcfg, dcfg, seed=7)
    assert os.path.exists(out)
    assert out.endswith(".denoise1.tsv")
    lines = open(out).read().splitlines()
    assert lines
    labels = [int(l.rsplit("\t", 1)[1]) for l in lines]
    # balanced pos/neg output (negatives re-selected to match positives)
    assert 0 < sum(labels) < len(labels)
    # intermediate files cleaned up
    leftover = [p for p in os.listdir(tmp_path)
                if "half" in p or "neg_all" in p]
    assert leftover == []
