"""Feature TSV / binary codecs (SURVEY.md §2.5 contracts)."""

import struct

import numpy as np

from deepsignal_tpu.io.feature_codec import (
    FeatureBatch, binary_record_dtype, binary_record_len,
    convert_txt_to_binary, format_feature_row,
    iter_feature_batches_by_read, parse_feature_lines, read_binary_features)


def _mk_row(readname="read1", pos=100, chrom="chr1"):
    k, s = 17, 360
    rng = np.random.default_rng(pos)
    means = np.around(rng.normal(0, 1, k), 6)
    stds = np.around(np.abs(rng.normal(0, 1, k)), 6)
    lens = rng.integers(1, 50, k)
    cent = np.around(rng.normal(0, 1, s), 6)
    kmer = "".join(np.array(list("ACGT"))[rng.integers(0, 4, k)])
    return format_feature_row(chrom, pos, "+", pos, readname, "t", kmer,
                              means, stds, lens, cent, 1)


def test_binary_record_len_default():
    assert binary_record_len(17, 360) == 1628  # SURVEY.md §2.5
    assert binary_record_dtype(17, 360).itemsize == 1628


def test_binary_dtype_matches_struct_format():
    # same byte count as the reference struct '<17B17f17f17H360f1B'
    assert binary_record_dtype(17, 360).itemsize == \
        struct.calcsize("<17B17f17f17H360f1B")
    assert binary_record_dtype(9, 100).itemsize == \
        struct.calcsize("<9B9f9f9H100f1B")


def test_tsv_parse_roundtrip():
    lines = [_mk_row(pos=i) for i in range(5)]
    batch = parse_feature_lines(lines)
    assert len(batch) == 5
    assert batch.kmers.shape == (5, 17)
    assert batch.signals.shape == (5, 360)
    assert batch.labels.tolist() == [1] * 5
    # first six columns survive verbatim
    assert batch.sampleinfo[2] == "\t".join(lines[2].split("\t")[:6])


def test_txt_to_binary_roundtrip(tmp_path):
    lines = [_mk_row(pos=i) for i in range(7)]
    txt = tmp_path / "f.tsv"
    txt.write_text("\n".join(lines) + "\n")
    binp = tmp_path / "f.bin"
    n = convert_txt_to_binary(str(txt), str(binp))
    assert n == 7
    assert binp.stat().st_size == 7 * 1628

    src = parse_feature_lines(lines)
    back = read_binary_features(str(binp))
    np.testing.assert_array_equal(back.kmers, src.kmers)
    np.testing.assert_array_equal(back.means, src.means)
    np.testing.assert_array_equal(back.stds, src.stds)
    np.testing.assert_array_equal(back.lens, src.lens)
    np.testing.assert_array_equal(back.signals, src.signals)
    np.testing.assert_array_equal(back.labels, src.labels)


def test_binary_matches_reference_struct_pack(tmp_path):
    # byte-identical to the reference's struct.pack loop (process_utils.py:355-373)
    line = _mk_row(pos=3)
    txt = tmp_path / "one.tsv"
    txt.write_text(line + "\n")
    binp = tmp_path / "one.bin"
    convert_txt_to_binary(str(txt), str(binp))

    words = line.split("\t")
    b2c = {"A": 0, "C": 1, "G": 2, "T": 3, "N": 4}
    base_int = [b2c[v] for v in words[6]]
    means = [float(v) for v in words[7].split(",")]
    stds = [float(v) for v in words[8].split(",")]
    siglen = [int(v) for v in words[9].split(",")]
    signals = [float(v) for v in words[10].split(",")]
    label = int(words[11])
    want = struct.pack("<17B17f17f17H360f1B",
                       *(base_int + means + stds + siglen + signals + [label]))
    assert binp.read_bytes() == want


def test_iter_batches_by_read_grouping(tmp_path):
    # reads stay contiguous; batch emitted per `reads_per_batch` completed reads
    # (call_modifications.py:59-69)
    lines = []
    for r in range(5):
        for i in range(3):
            lines.append(_mk_row(readname=f"read{r}", pos=r * 10 + i))
    f = tmp_path / "g.tsv"
    f.write_text("\n".join(lines) + "\n")
    batches = list(iter_feature_batches_by_read(str(f), reads_per_batch=2))
    assert [len(b) for b in batches] == [6, 6, 3]
    # no read split across batches
    for b in batches:
        names = [s.split("\t")[4] for s in b.sampleinfo]
        seen = set()
        prev = None
        for nm in names:
            if nm != prev:
                assert nm not in seen
                seen.add(nm)
                prev = nm


def test_feature_batch_concat_and_slice():
    b1 = parse_feature_lines([_mk_row(pos=1)])
    b2 = parse_feature_lines([_mk_row(pos=2), _mk_row(pos=3)])
    cat = FeatureBatch.concat([b1, b2])
    assert len(cat) == 3
    sl = cat[1:]
    assert len(sl) == 2
    assert sl.sampleinfo[0] == b2.sampleinfo[0]
