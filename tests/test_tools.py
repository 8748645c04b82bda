"""Tools layer vs reference script semantics (scripts/*.py)."""

import random

import numpy as np
import pytest

from deepsignal_tpu.tools import dataset as ds
from deepsignal_tpu.tools.evaluate import evaluate_sites, roc_auc, CallRecord
from deepsignal_tpu.tools.frequency import (calculate_mods_frequency,
                                            call_mods_frequency_to_file,
                                            combine_freq_files)


def _call_line(chrom="chr1", pos=10, strand="+", read="r1", p1=0.9, label=1,
               kmer="ACGTA"):
    p0 = 1.0 - p1
    return "\t".join([chrom, str(pos), strand, str(pos), read, "t", str(p0),
                      str(p1), str(label), kmer])


def test_frequency_aggregation(tmp_path):
    calls = tmp_path / "calls.tsv"
    calls.write_text("\n".join([
        _call_line(pos=10, read="r1", p1=0.9, label=1),
        _call_line(pos=10, read="r2", p1=0.8, label=1),
        _call_line(pos=10, read="r3", p1=0.2, label=0),
        _call_line(pos=20, read="r1", p1=0.6, label=1),
    ]) + "\n")
    stats = calculate_mods_frequency([str(calls)], prob_cf=0.0)
    s10 = stats["chr1||10"]
    assert s10.coverage == 3 and s10.met == 2 and s10.unmet == 1
    assert abs(s10.prob_1 - (0.9 + 0.8 + 0.2)) < 1e-9

    # prob_cf drops ambiguous calls: |p1-p0| = 0.2 < 0.5 for the pos=20 row
    out = tmp_path / "freq.tsv"
    call_mods_frequency_to_file([str(calls)], str(out), prob_cf=0.5,
                                is_sort=True)
    lines = out.read_text().splitlines()
    assert len(lines) == 1  # pos 20 dropped entirely
    w = lines[0].split("\t")
    assert w[0] == "chr1" and w[1] == "10"
    assert w[8] == "3"  # coverage
    assert w[9] == "0.6667"  # rmet = 2/3, %.4f


def test_frequency_bed_format(tmp_path):
    calls = tmp_path / "calls.tsv"
    calls.write_text(_call_line(pos=5, p1=0.99, label=1) + "\n")
    out = tmp_path / "freq.bed"
    call_mods_frequency_to_file([str(calls)], str(out), is_bed=True)
    w = out.read_text().strip().split("\t")
    assert w[:3] == ["chr1", "5", "6"]
    assert w[10] == "100"  # rmet 1.0 -> 100


def test_combine_freq_files(tmp_path):
    f1 = tmp_path / "a.freq"
    f2 = tmp_path / "b.freq"
    f1.write_text("chr1\t10\t+\t10\t0.300\t2.700\t3\t0\t3\t1.000\tACGTA\n")
    f2.write_text("chr1\t10\t+\t10\t0.900\t1.100\t1\t1\t2\t0.500\tACGTA\n")
    out = tmp_path / "c.freq"
    combine_freq_files([str(f1), str(f2)], str(out))
    w = out.read_text().strip().split("\t")
    assert w[6] == "4" and w[7] == "1" and w[8] == "5"  # met, unmet, cov
    assert w[9] == "0.800"


def test_roc_auc_matches_sklearn(rng):
    from sklearn.metrics import roc_auc_score
    for _ in range(5):
        y = rng.integers(0, 2, 200)
        s = rng.normal(0, 1, 200)
        s[y == 1] += 0.5
        # add ties
        s = np.round(s, 1)
        assert abs(roc_auc(y, s) - roc_auc_score(y, s)) < 1e-12


def test_evaluate_sites_counts():
    sites = [CallRecord("k1", 1, True, 0.1, 0.9),    # tp
             CallRecord("k2", 1, False, 0.2, 0.8),   # fp
             CallRecord("k3", 0, False, 0.9, 0.1),   # tn
             CallRecord("k4", 0, True, 0.8, 0.2)]    # fn
    line = evaluate_sites(sites, 0.0)
    w = line.split("\t")
    assert w[:4] == ["1", "1", "1", "1"]
    assert w[4] == "0.500"  # accuracy


def test_random_select_split_roundtrip(tmp_path):
    src = tmp_path / "src.txt"
    lines = [f"line{i}\t{i % 2}\n" for i in range(100)]
    src.write_text("".join(lines))
    f1, f2 = tmp_path / "a.txt", tmp_path / "b.txt"
    l1, l2 = ds.random_select_file_rows_s(str(src), str(f1), str(f2), 40,
                                          rng=random.Random(3))
    assert len(l1) == 40 and len(l2) == 60
    a = f1.read_text().splitlines()
    b = f2.read_text().splitlines()
    assert len(a) == 40 and len(b) == 60
    # index mapping correct: line at original index l1[i] equals a[i]
    assert a[0] == lines[l1[0]].strip()
    assert b[5] == lines[l2[5]].strip()
    assert sorted(a + b) == sorted(x.strip() for x in lines)


def test_concat_two_files_preserves_all_rows(tmp_path):
    f1 = tmp_path / "f1.txt"
    f2 = tmp_path / "f2.txt"
    f1.write_text("".join(f"a{i}\n" for i in range(50)))
    f2.write_text("".join(f"b{i}\n" for i in range(150)))
    out = tmp_path / "cat.txt"
    ds.concat_two_files(str(f1), str(f2), str(out), shuffle_lines_num=20,
                        seed=0)
    got = sorted(out.read_text().splitlines())
    want = sorted([f"a{i}" for i in range(50)] +
                  [f"b{i}" for i in range(150)])
    assert got == want


def test_shuffle_big_file(tmp_path):
    src = tmp_path / "big.txt"
    src.write_text("".join(f"{i}\n" for i in range(500)))
    out = ds.shuffle_big_file(str(src), num_lines_shuffle=100,
                              temp_dir=str(tmp_path), seed=1)
    lines = open(out).read().splitlines()
    assert sorted(int(x) for x in lines) == list(range(500))
    assert [int(x) for x in lines] != list(range(500))  # actually shuffled


def _fea_line(kmer, label=1, pos=0):
    return "\t".join(["chr1", str(pos), "+", str(pos), "r", "t", kmer,
                      "0.1", "0.2", "3", "0.5", str(label)])


def test_kmer_distribution_and_neg_selection(tmp_path):
    pos_f = tmp_path / "pos.tsv"
    neg_f = tmp_path / "neg.tsv"
    pos_rows = [_fea_line("AAACG", 1, i) for i in range(6)] + \
               [_fea_line("CCCCG", 1, i) for i in range(3)]
    neg_rows = [_fea_line("AAACG", 0, i) for i in range(20)] + \
               [_fea_line("CCCCG", 0, i) for i in range(20)] + \
               [_fea_line("GGGCG", 0, i) for i in range(20)]
    pos_f.write_text("\n".join(pos_rows) + "\n")
    neg_f.write_text("\n".join(neg_rows) + "\n")

    dist = ds.write_kmer_distribution(str(pos_f))
    dlines = [l.split("\t") for l in open(dist).read().splitlines()]
    assert dlines[0][0] == "AAACG" and dlines[0][1] == "6"

    sel = tmp_path / "sel.tsv"
    n = ds.select_negsamples_asposkmer(str(pos_f), str(neg_f), str(sel),
                                       rng=random.Random(0))
    sel_lines = open(sel).read().splitlines()
    assert len(sel_lines) == n
    kmers = [l.split("\t")[6] for l in sel_lines]
    # ratio-matched: ceil(9 * 6/9) = 6 AAACG, ceil(9 * 3/9) = 3 CCCCG
    assert kmers.count("AAACG") == 6
    assert kmers.count("CCCCG") == 3


def test_filter_by_label(tmp_path):
    f = tmp_path / "fea.tsv"
    f.write_text("\n".join([_fea_line("AAAAA", 1), _fea_line("CCCCC", 0),
                            _fea_line("GGGGG", 1)]) + "\n")
    out = tmp_path / "filtered.tsv"
    n = ds.filter_samples_by_label(str(f), str(out), 1)
    assert n == 2
    assert all(l.endswith("\t1") for l in out.read_text().splitlines())


def test_filter_by_positions_rewrites_label(tmp_path):
    f = tmp_path / "fea.tsv"
    f.write_text("\n".join([_fea_line("AAAAA", 1, pos=5),
                            _fea_line("CCCCC", 1, pos=9)]) + "\n")
    posf = tmp_path / "pos.tsv"
    posf.write_text("chr1\t5\n")
    out = tmp_path / "filtered.tsv"
    n = ds.filter_samples_by_positions(str(f), str(posf), str(out),
                                       label="0")
    assert n == 1
    line = out.read_text().strip()
    assert line.split("\t")[1] == "5"
    assert line.endswith("\t0")  # label rewritten


def test_combine_two_strands(tmp_path):
    # genome with one CG at pos 3 (fwd C) => '-'-strand G at pos 4
    ref = tmp_path / "ref.fa"
    ref.write_text(">chrT desc\nAAACGAAA\n")
    freq = tmp_path / "f.freq"
    freq.write_text(
        "chrT\t3\t+\t3\t0.100\t1.900\t2\t0\t2\t1.000\tAACGA\n"
        "chrT\t4\t-\t3\t0.300\t0.700\t1\t1\t2\t0.500\tTTCGT\n")
    from deepsignal_tpu.tools.combine import combine_two_strands_frequency
    out = combine_two_strands_frequency(str(freq), str(ref))
    lines = open(out).read().splitlines()
    assert len(lines) == 1
    w = lines[0].split("\t")
    # chrom, fwd pos, '+', pos, prob0, prob1, met, unmet, cov, rmet, kmer
    assert w[0] == "chrT" and w[1] == "3" and w[2] == "+"
    assert int(w[6]) == 3 and int(w[7]) == 1 and int(w[8]) == 4
    assert abs(float(w[9]) - 0.75) < 1e-9


def test_runner_plan_full_pipeline():
    from deepsignal_tpu.tools.runner import RunnerConfig, plan
    cfg = RunnerConfig(input_path="/d/f5/", ref_fp="/d/ref.fa",
                       model_path="/d/m", result_file="/d/out.tsv",
                       is_multi_reads=True, threads=8)
    cmds = plan(cfg)
    names = [c[0] for c in cmds]
    assert names == ["multi_to_single_fast5", "guppy_basecaller", "tombo",
                     "tombo", "<in-process>"]
    # multi->single output feeds downstream stages
    assert "/d/f5.single" in cmds[1]
    assert cmds[2][1] == "preprocess" and cmds[3][1] == "resquiggle"
    assert "--threads" in cmds[0] and cmds[0][cmds[0].index("--threads") + 1] == "8"


def test_runner_plan_skips_done_stages():
    from deepsignal_tpu.tools.runner import RunnerConfig, plan
    cfg = RunnerConfig(input_path="/d/f5", ref_fp="/d/ref.fa",
                       model_path="/d/m", result_file="/d/o.tsv",
                       is_resquiggled=True)
    cmds = plan(cfg)
    assert [c[0] for c in cmds] == ["<in-process>"]
    cfg2 = RunnerConfig(input_path="/d/f5", ref_fp="/d/ref.fa",
                        model_path="/d/m", result_file="/d/o.tsv",
                        is_basecalled=True)
    assert [c[0] for c in plan(cfg2)] == ["tombo", "<in-process>"]


def test_runner_combine_fastqs(tmp_path):
    from deepsignal_tpu.tools.runner import _combine_fastqs
    (tmp_path / "a.fastq").write_text("@r1\nACGT\n+\n!!!!\n")
    (tmp_path / "b.fastq").write_text("@r2\nGGGG\n+\n!!!!\n")
    combined = _combine_fastqs(str(tmp_path))
    text = open(combined).read()
    assert "@r1" in text and "@r2" in text
    # idempotent: combined.fastq itself is excluded from re-concatenation
    combined2 = _combine_fastqs(str(tmp_path))
    assert open(combined2).read() == text


def test_runner_executes_external_stages_via_injected_runner(
        tmp_path, monkeypatch):
    from deepsignal_tpu.tools import runner as runner_mod
    fq_dir = tmp_path / "f5.guppy.fq"
    fq_dir.mkdir()
    (fq_dir / "a.fastq").write_text("@r1\nACGT\n+\n!!!!\n")
    ran = []

    def fake_exec(argv):
        ran.append(argv[1] if argv[0] == "tombo" else argv[0])
        if argv[0] == "tombo" and argv[1] == "preprocess":
            combined = argv[argv.index("--fastq-filenames") + 1]
            assert "@r1" in open(combined).read()

    called = {}
    monkeypatch.setattr(
        "deepsignal_tpu.runtime.caller.run_call_mods",
        lambda *a, **kw: called.setdefault("args", a) or 0)
    cfg = runner_mod.RunnerConfig(
        input_path=str(tmp_path / "f5"), ref_fp=str(tmp_path / "ref.fa"),
        model_path="m.ckpt", result_file=str(tmp_path / "out.tsv"))
    runner_mod.run_pipeline(cfg, runner=fake_exec)
    assert ran == ["guppy_basecaller", "preprocess", "resquiggle"]
    # combined.fastq removed after preprocess (reference removes it too)
    assert not (fq_dir / "combined.fastq").exists()
    assert called["args"][0] == str(tmp_path / "f5")
