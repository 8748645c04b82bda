"""CLI surface: parser contract + host-only subcommands end-to-end."""

import numpy as np
import pytest

from deepsignal_tpu.cli.main import build_parser, main


def test_all_subcommands_registered():
    parser = build_parser()
    subactions = [a for a in parser._actions
                  if hasattr(a, "choices") and a.choices]
    cmds = set(subactions[0].choices.keys())
    # the reference's 4 core modules (deepsignal.py:131-427)
    assert {"extract", "call_mods", "train", "denoise"} <= cmds
    # scripts promoted to subcommands (SURVEY.md §2.2)
    assert {"call_freq", "combine_freq", "combine_strands", "evaluate",
            "binarize", "filter_label", "filter_positions", "select_neg",
            "kmer_dist", "randsel", "shuffle", "concat",
            "visualize_log"} <= cmds


def test_extract_parser_defaults():
    parser = build_parser()
    args = parser.parse_args(["extract", "-i", "/x", "-o", "/y"])
    # reference CLI defaults (SURVEY.md §2.6)
    assert args.kmer_len == 17
    assert args.cent_signals_len == 360
    assert args.motifs == "CG"
    assert args.mod_loc == 0
    assert args.methy_label == 1
    assert args.normalize_method == "mad"
    assert args.nproc == 1
    assert args.f5_batch_num == 50
    assert args.w_batch_num == 200
    assert args.corrected_group == "RawGenomeCorrected_000"


def test_train_parser_defaults():
    parser = build_parser()
    args = parser.parse_args(["train", "--train_file", "a", "--valid_file",
                              "b", "-o", "m"])
    assert args.batch_size == 512
    assert args.learning_rate == 0.001
    assert args.decay_rate == 0.1
    assert args.keep_prob == 0.5
    assert args.max_epoch_num == 10
    assert args.min_epoch_num == 5
    assert args.display_step == 100
    assert args.pos_weight == 1.0


def test_denoise_parser_defaults():
    parser = build_parser()
    args = parser.parse_args(["denoise", "--train_file", "a"])
    assert args.iterations == 6 and args.rounds == 5
    assert args.epoch_num == 5 and args.score_cf == 0.5
    assert args.is_cnn == "no" and args.is_rnn == "yes"


def test_no_command_prints_help():
    assert main([]) == 1


def test_binarize_cli(tmp_path, rng):
    k, s = 5, 24
    bases = np.array(list("ACGT"))
    rows = []
    for i in range(3):
        kmer = "".join(bases[rng.integers(0, 4, k)])
        rows.append("\t".join(
            ["chr1", str(i), "+", str(i), "r", "t", kmer,
             ",".join(["0.1"] * k), ",".join(["0.2"] * k),
             ",".join(["3"] * k), ",".join(["0.5"] * s), "1"]))
    f = tmp_path / "fea.tsv"
    f.write_text("\n".join(rows) + "\n")
    out = tmp_path / "fea.bin"
    assert main(["binarize", "-i", str(f), "-o", str(out), "-x", "5",
                 "-y", "24"]) == 0
    assert out.stat().st_size == 3 * (5 * 11 + 24 * 4 + 1)


def test_call_freq_cli(tmp_path):
    calls = tmp_path / "calls.tsv"
    calls.write_text("chr1\t10\t+\t10\tr1\tt\t0.1\t0.9\t1\tACGTA\n")
    out = tmp_path / "freq.tsv"
    assert main(["call_freq", "-i", str(calls), "-o", str(out),
                 "--sort"]) == 0
    w = out.read_text().strip().split("\t")
    assert w[0] == "chr1" and w[8] == "1"


def test_filter_label_cli(tmp_path):
    f = tmp_path / "fea.tsv"
    f.write_text("a\tb\t1\nc\td\t0\n")
    out = tmp_path / "out.tsv"
    assert main(["filter_label", "-i", str(f), "-o", str(out),
                 "--label", "0"]) == 0
    assert out.read_text() == "c\td\t0\n"


def _train_cli_rows(rng, n, k=5, s=24):
    """Separable synthetic feature rows for the train-CLI tests."""
    bases = np.array(list("ACGT"))
    rows = []
    for i in range(n):
        label = int(rng.integers(0, 2))
        shift = 1.0 if label else -1.0
        kmer = "".join(bases[rng.integers(0, 4, k)])
        means = np.around(rng.normal(shift, 0.3, k), 6)
        stds = np.around(np.abs(rng.normal(0, 0.3, k)), 6)
        lens = rng.integers(1, 30, k)
        cent = np.around(rng.normal(shift, 0.3, s), 6)
        rows.append("\t".join(
            ["chr1", str(i), "+", str(i), f"read{i // 5}", "t", kmer,
             ",".join(map(str, means)), ",".join(map(str, stds)),
             ",".join(str(int(x)) for x in lens),
             ",".join(map(str, cent)), str(label)]))
    return rows


def test_train_parser_resume_seed_flags():
    parser = build_parser()
    args = parser.parse_args(["train", "--train_file", "a", "--valid_file",
                              "b", "-o", "m"])
    assert args.resume == "no" and args.seed == 42
    args = parser.parse_args(["train", "--train_file", "a", "--valid_file",
                              "b", "-o", "m", "--resume", "yes",
                              "--seed", "7"])
    assert args.resume == "yes" and args.seed == 7


def test_train_cli_resume_matches_unbroken(tmp_path, rng):
    """CLI-level: an interrupted (1-epoch) run continued with --resume yes
    must reproduce an unbroken 3-epoch run bit-for-bit (train_state blobs)."""
    import os
    train_f = tmp_path / "train.tsv"
    valid_f = tmp_path / "valid.tsv"
    train_f.write_text("\n".join(_train_cli_rows(rng, 64)) + "\n")
    valid_f.write_text("\n".join(_train_cli_rows(rng, 16)) + "\n")

    def run(model_dir, max_epochs, resume):
        argv = ["train", "--train_file", str(train_f),
                "--valid_file", str(valid_f), "-o", model_dir,
                "--kmer_len", "5", "--cent_signals_len", "24",
                "--batch_size", "16", "--max_epoch_num", str(max_epochs),
                "--min_epoch_num", "3", "--display_step", "2",
                "--seed", "7"]
        if resume:
            argv += ["--resume", "yes"]
        assert main(argv) == 0

    dir_a = str(tmp_path / "unbroken")
    run(dir_a, 3, resume=False)
    dir_b = str(tmp_path / "resumed")
    run(dir_b, 1, resume=False)   # "killed" after epoch 0
    run(dir_b, 3, resume=True)    # continue

    for blob in ("variables.msgpack", "train_state.msgpack"):
        a = open(os.path.join(dir_a, "train_state.ckpt", blob), "rb").read()
        b = open(os.path.join(dir_b, "train_state.ckpt", blob), "rb").read()
        assert a == b, f"{blob} differs between resumed and unbroken runs"


def test_call_mods_cli_end_to_end(tmp_path, rng):
    """argv-level call_mods: fast5-dir input and feature-TSV input both
    produce the 10-column call TSV through the real CLI plumbing."""
    import os
    from deepsignal_tpu.core.config import ModelConfig
    from deepsignal_tpu.io.fast5 import write_synthetic_fast5
    from deepsignal_tpu.models.deepsignal import init_model
    from deepsignal_tpu.train.checkpoints import save_checkpoint

    f5dir = tmp_path / "f5"
    f5dir.mkdir()
    for i in range(4):
        n = 80
        seq = np.array(list("ACT"))[rng.integers(0, 3, n)]
        pos = np.arange(4, n - 5, 10)
        seq[pos] = "C"
        seq[pos + 1] = "G"
        lens = rng.integers(4, 12, n)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        raw = rng.integers(300, 600, int(lens.sum())).astype(np.int16)
        write_synthetic_fast5(
            str(f5dir / f"r{i}.fast5"), f"read{i}", raw, starts, lens,
            "".join(seq), "chr1", 100 * i, "+" if i % 2 == 0 else "-")

    cfg = ModelConfig(lstm_hidden=8, lstm_layers=1, inception_times=1,
                      inception_blocks=(1, 1, 1), kmer_len=5,
                      cent_signals_len=24)
    _, variables = init_model(cfg, batch_size=4)
    ckpt = str(tmp_path / "model.ckpt")
    save_checkpoint(ckpt, cfg, variables)

    calls_dir = str(tmp_path / "calls_dir.tsv")
    # the dir-vs-file comparison below asserts 1e-5 prob closeness, so both
    # runs pin the f32 parity path (the shipped bfloat16 default is gated
    # separately, tests/test_bf16_gate.py)
    assert main(["call_mods", "-i", str(f5dir), "-m", ckpt,
                 "-o", calls_dir, "--kmer_len", "5",
                 "--cent_signals_len", "24", "--nproc", "2",
                 "--f5_batch_num", "2", "--batch_size", "64",
                 "--compute_dtype", "float32"]) == 0
    rows = open(calls_dir).read().splitlines()
    assert rows and all(len(r.split("\t")) == 10 for r in rows)
    # prob columns renormalize to 1
    p0, p1 = map(float, rows[0].split("\t")[6:8])
    assert abs(p0 + p1 - 1.0) < 1e-5

    # feature-TSV input through the extract CLI first
    fea = str(tmp_path / "fea.tsv")
    assert main(["extract", "-i", str(f5dir), "-o", fea, "--kmer_len", "5",
                 "--cent_signals_len", "24", "--nproc", "2"]) == 0
    calls_file = str(tmp_path / "calls_file.tsv")
    assert main(["call_mods", "-i", fea, "-m", ckpt, "-o", calls_file,
                 "--kmer_len", "5", "--cent_signals_len", "24",
                 "--batch_size", "64", "--compute_dtype", "float32"]) == 0
    rows_f = sorted(open(calls_file).read().splitlines())
    # dir-mode and file-mode call the same sites with float32-close probs
    # (not byte-equal: the TSV round-trips features through 6-decimal
    # strings while dir mode keeps full float64 — the reference's direct
    # fast5 path has the same divergence vs its TSV path)
    rows_d = sorted(rows)
    assert len(rows_f) == len(rows_d)
    for got, want in zip(rows_f, rows_d):
        g, w = got.split("\t"), want.split("\t")
        assert g[:6] == w[:6] and g[8:] == w[8:], (got, want)
        for gp, wp in zip(g[6:8], w[6:8]):
            assert abs(float(gp) - float(wp)) < 1e-5, (got, want)
