"""RNA alphabet threading + call-prob string parity + early-stop semantics.

Covers:
- RNA-mode extraction writes U (not T/N) in feature-TSV kmers, matching the
  reference which emits the raw event-base string (extract_features.py:289).
- RNA-mode calling decodes kmer code 3 back to U in the 10-col output (the
  reference's own file-mode caller is DNA-only — base2code_dna hardcoded at
  call_modifications.py:52,80,114 — so this extends, not mirrors, it).
- Prob strings byte-match the reference host chain
  str(float32 / (float32 + float32)) (call_modifications.py:185-190).
- Trainer early stop mirrors train_model.py:270-284.
"""

import numpy as np
import pytest

from deepsignal_tpu.core.config import FeatureConfig, ModelConfig, TrainConfig
from deepsignal_tpu.core.constants import get_motif_seqs
from deepsignal_tpu.featurize.extractor import extract_read_features
from deepsignal_tpu.io.fast5 import read_resquiggled_fast5, write_synthetic_fast5
from deepsignal_tpu.io.feature_codec import parse_feature_lines
from deepsignal_tpu.models.deepsignal import init_model
from deepsignal_tpu.runtime.caller import ModCaller, decode_kmer_strings

TINY = dict(lstm_hidden=8, lstm_layers=1, inception_times=1,
            inception_blocks=(1, 1, 1), cent_signals_len=24, kmer_len=5)


def _write_rna_f5(tmp_path, rng, n_events=60):
    bases = np.array(list("ACGU"))
    seq = "".join(bases[rng.integers(0, 4, n_events)])
    lengths = rng.integers(3, 12, size=n_events)
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    raw = rng.integers(400, 900, size=int(lengths.sum()) + 4).astype(np.int16)
    path = str(tmp_path / "rna.fast5")
    write_synthetic_fast5(path, read_id="rna-1", raw_signal=raw,
                          event_starts_rel=starts, event_lengths=lengths,
                          seq=seq, mapped_chrom="tr1", mapped_start=10,
                          mapped_strand="+", read_start_rel_to_raw=2)
    return path, seq


def test_rna_extract_kmer_strings(tmp_path, rng):
    cfg = FeatureConfig(kmer_len=5, is_dna=False, motifs="CG")
    path, seq = _write_rna_f5(tmp_path, rng)
    read = read_resquiggled_fast5(path)
    feats = extract_read_features(read, get_motif_seqs("CG", is_dna=False),
                                  cfg, None)
    if feats is None:
        pytest.skip("no CG site in random RNA seq")
    rows = feats.to_tsv_rows()
    for i, row in enumerate(rows):
        kmer = row.split("\t")[6]
        loc = int(row.split("\t")[1]) - 10
        assert kmer == seq[loc - 2: loc + 3]  # raw U letters survive
    assert any("U" in r.split("\t")[6] for r in rows) or "U" not in seq


def test_decode_kmer_strings_rna():
    kmers = np.array([[0, 1, 2, 3, 4]])
    assert decode_kmer_strings(kmers, is_dna=True) == ["ACGTN"]
    assert decode_kmer_strings(kmers, is_dna=False) == ["ACGUN"]


def test_parse_feature_lines_rna_kmer():
    row = "\t".join(["tr1", "12", "+", "12", "r1", "t", "ACGUN",
                     ",".join(["0.1"] * 5), ",".join(["0.2"] * 5),
                     ",".join(["3"] * 5), ",".join(["0.0"] * 24), "1"])
    fb = parse_feature_lines([row])
    # U encodes to 3 (same as the native parser's base_code)
    assert fb.kmers.tolist() == [[0, 1, 2, 3, 4]]


def test_prob_string_matches_reference_chain(rng):
    """Vectorized float32 renormalization + str() must equal the reference's
    per-scalar chain (call_modifications.py:185-190) byte-for-byte."""
    act = (1.0 / (1.0 + np.exp(-rng.normal(0, 3, (200, 2))))).astype(np.float32)
    total = act[:, 0] + act[:, 1]
    p0 = act[:, 0] / total
    p1 = act[:, 1] / total
    for idx in range(act.shape[0]):
        prob_0, prob_1 = act[idx][0], act[idx][1]
        assert str(p0[idx]) == str(prob_0 / (prob_0 + prob_1))
        assert str(p1[idx]) == str(prob_1 / (prob_0 + prob_1))


def test_caller_rows_embed_float32_prob_strings(rng):
    cfg = ModelConfig(**TINY)
    _, variables = init_model(cfg)
    caller = ModCaller(cfg, variables, batch_size=4)
    rows_in = []
    bases = np.array(list("ACGU"))
    for i in range(6):
        kmer = "".join(bases[rng.integers(0, 4, 5)])
        rows_in.append("\t".join(
            ["tr1", str(i), "+", str(i), "r0", "t", kmer,
             ",".join(str(x) for x in np.around(rng.normal(0, 1, 5), 6)),
             ",".join(str(x) for x in np.around(np.abs(rng.normal(0, 1, 5)), 6)),
             ",".join(str(int(x)) for x in rng.integers(1, 20, 5)),
             ",".join(str(x) for x in np.around(rng.normal(0, 1, 24), 6)),
             "1"]))
    fb = parse_feature_lines(rows_in)
    rows, _, (p0, p1) = caller.call_feature_batch(fb, is_dna=False)
    assert p0.dtype == np.float32
    for idx, row in enumerate(rows):
        w = row.split("\t")
        assert w[6] == str(p0[idx])  # float32 repr, not float64
        assert w[7] == str(p1[idx])
        assert w[9] == rows_in[idx].split("\t")[6]  # U kmers round-trip


@pytest.mark.parametrize("accuracies,min_epochs,expect_epochs", [
    # epoch1 fails to improve and epoch_id(1) >= min_epoch_num-1(0) -> stop
    ([0.8, 0.8, 0.9, 0.9], 1, 2),
    # min_epoch_num=3 shields epochs 0-1; first eligible non-improving
    # epoch is 3 (0.7 after best 0.9)
    ([0.8, 0.7, 0.9, 0.7, 0.7], 3, 4),
    # monotone improvement -> run all max_epoch_num epochs
    ([0.5, 0.6, 0.7, 0.8, 0.9, 0.95], 3, 6),
])
def test_early_stop_mirrors_reference(tmp_path, rng, monkeypatch,
                                      accuracies, min_epochs, expect_epochs):
    """No-improvement epoch at epoch_id >= min_epoch_num-1 stops training
    (train_model.py:270-284).  Validation accuracy is scripted per epoch so
    the stop rule is tested in isolation."""
    import deepsignal_tpu.train.trainer as trainer_mod
    from tests.test_train import _fea_rows
    train_f = tmp_path / "train.tsv"
    valid_f = tmp_path / "valid.tsv"
    train_f.write_text("\n".join(_fea_rows(rng, 48)) + "\n")
    valid_f.write_text("\n".join(_fea_rows(rng, 16)) + "\n")
    seq = iter(accuracies)
    monkeypatch.setattr(trainer_mod, "_validate",
                        lambda *a, **k: (0.5, next(seq), 0.5, 0.5))
    mcfg = ModelConfig(**TINY)
    tcfg = TrainConfig(batch_size=16, max_epoch_num=6,
                       min_epoch_num=min_epochs, display_step=3)
    summary = trainer_mod.train(str(train_f), str(valid_f),
                                str(tmp_path / "m"), None, mcfg, tcfg,
                                is_binary=False)
    assert summary["epochs_run"] == expect_epochs
    assert summary["best_accuracy"] == max(accuracies[:expect_epochs])
