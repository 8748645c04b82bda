"""Training pipeline + trainer loop (train_model.py semantics)."""

import os

import numpy as np
import pytest

from deepsignal_tpu.core.config import ModelConfig, TrainConfig
from deepsignal_tpu.io.feature_codec import convert_txt_to_binary
from deepsignal_tpu.train.data import (BinaryFeatureDataset,
                                       TextFeatureDataset)
from deepsignal_tpu.train.trainer import Trainer, train

K, S = 5, 24
TINY = dict(lstm_hidden=8, lstm_layers=1, inception_times=1,
            inception_blocks=(1, 1, 1),
            cent_signals_len=S, kmer_len=K)


def _fea_rows(rng, n, separable=True):
    """Synthetic rows; label correlates with mean signal when separable."""
    rows = []
    bases = np.array(list("ACGT"))
    for i in range(n):
        label = int(rng.integers(0, 2))
        shift = (1.0 if label else -1.0) if separable else 0.0
        kmer = "".join(bases[rng.integers(0, 4, K)])
        means = np.around(rng.normal(shift, 0.3, K), 6)
        stds = np.around(np.abs(rng.normal(0, 0.3, K)), 6)
        lens = rng.integers(1, 30, K)
        cent = np.around(rng.normal(shift, 0.3, S), 6)
        rows.append("\t".join(
            ["chr1", str(i), "+", str(i), f"read{i // 5}", "t", kmer,
             ",".join(map(str, means)), ",".join(map(str, stds)),
             ",".join(str(int(x)) for x in lens),
             ",".join(map(str, cent)), str(label)]))
    return rows


def test_text_dataset_batches(tmp_path, rng):
    f = tmp_path / "t.tsv"
    f.write_text("\n".join(_fea_rows(rng, 25)) + "\n")
    ds = TextFeatureDataset(str(f), chunk_lines=10)
    batches = list(ds.batches(8))
    # 25 rows -> 3 full batches of 8 + padded last of 1
    assert len(batches) == 4
    assert all(b["kmer"].shape == (8, K) for b in batches)
    assert [b.valid for b in batches] == [8, 8, 8, 1]
    # order preserved without shuffle (pos column == row index)
    # and with shuffle all rows covered once
    sh = list(ds.batches(8, shuffle_rng=np.random.default_rng(0)))
    seen = np.concatenate([b["labels"][:b.valid] for b in sh])
    assert seen.shape[0] == 25


def test_binary_dataset_matches_text(tmp_path, rng):
    rows = _fea_rows(rng, 17)
    txt = tmp_path / "t.tsv"
    txt.write_text("\n".join(rows) + "\n")
    binp = tmp_path / "t.bin"
    convert_txt_to_binary(str(txt), str(binp), K, S)
    bds = BinaryFeatureDataset(str(binp), K, S)
    assert len(bds) == 17
    tb = list(TextFeatureDataset(str(txt)).batches(17))[0]
    bb = list(bds.batches(17))[0]
    np.testing.assert_array_equal(tb["kmer"], bb["kmer"])
    np.testing.assert_array_equal(tb["signals"], bb["signals"])
    np.testing.assert_array_equal(tb["labels"], bb["labels"])


def test_trainer_step_and_eval(rng):
    mcfg = ModelConfig(**TINY)
    tcfg = TrainConfig(batch_size=8, display_step=1000, max_epoch_num=1)
    trainer = Trainer(mcfg, tcfg)
    batch = dict(
        kmer=rng.integers(0, 4, (8, K)).astype(np.int32),
        means=rng.normal(0, 1, (8, K)).astype(np.float32),
        stds=np.abs(rng.normal(0, 1, (8, K))).astype(np.float32),
        sanums=rng.integers(1, 30, (8, K)).astype(np.float32),
        signals=rng.normal(0, 1, (8, S)).astype(np.float32),
        labels=rng.integers(0, 2, 8).astype(np.int32))
    batch["__valid__"] = 6  # padded tail of 2
    loss, counts, preds, valid = trainer.train_on_batch(dict(batch), 0.001)
    assert valid == 6 and preds.shape == (6,)
    assert np.isfinite(loss)
    loss2, counts2, preds2, probs, valid2 = trainer.eval_on_batch(dict(batch))
    assert valid2 == 6 and probs.shape == (6,)
    # LR schedule: single-step decay after epoch 1 (train_model.py:123-126)
    assert trainer.epoch_lr(0) == tcfg.learning_rate
    assert trainer.epoch_lr(1) == tcfg.learning_rate
    assert trainer.epoch_lr(2) == tcfg.learning_rate * tcfg.decay_rate
    assert trainer.epoch_lr(9) == tcfg.learning_rate * tcfg.decay_rate


def test_train_end_to_end(tmp_path, rng):
    train_f = tmp_path / "train.tsv"
    valid_f = tmp_path / "valid.tsv"
    train_f.write_text("\n".join(_fea_rows(rng, 120)) + "\n")
    valid_f.write_text("\n".join(_fea_rows(rng, 40)) + "\n")
    mcfg = ModelConfig(**TINY)
    tcfg = TrainConfig(batch_size=16, learning_rate=0.005, max_epoch_num=2,
                       min_epoch_num=1, display_step=4)
    model_dir = str(tmp_path / "model")
    log_dir = str(tmp_path / "logs")
    summary = train(str(train_f), str(valid_f), model_dir, log_dir, mcfg,
                    tcfg, is_binary=False)
    assert summary["epochs_run"] >= 1
    assert summary["model_path"] is not None
    assert os.path.isdir(summary["model_path"])
    assert os.path.basename(summary["model_path"]).startswith(
        f"bn_{K}.sn_{S}.epoch_")
    # log files in the reference's parseable format
    tlog = open(os.path.join(log_dir, "train.txt")).read().splitlines()
    assert tlog and tlog[0].startswith("epoch:0, iterid:4, loss:")
    assert "accuracy:" in tlog[0] and "precision:" in tlog[0]
    # separable data should be learnable above chance
    assert summary["best_accuracy"] > 0.6

    # the saved checkpoint loads and scores
    from deepsignal_tpu.train.checkpoints import load_checkpoint
    cfg2, variables = load_checkpoint(summary["model_path"])
    assert cfg2.kmer_len == K


def test_resume_matches_unbroken_run(tmp_path, rng):
    """Interrupting after epoch 0 and resuming must reproduce an unbroken
    3-epoch run exactly (optimizer state + RNG + shuffle stream restored)."""
    train_f = tmp_path / "train.tsv"
    valid_f = tmp_path / "valid.tsv"
    train_f.write_text("\n".join(_fea_rows(rng, 64)) + "\n")
    valid_f.write_text("\n".join(_fea_rows(rng, 16)) + "\n")
    mcfg = ModelConfig(**TINY)

    def tcfg(max_epochs):
        return TrainConfig(batch_size=16, learning_rate=0.005,
                           max_epoch_num=max_epochs, min_epoch_num=3,
                           display_step=2, seed=7)

    dir_a = str(tmp_path / "unbroken")
    sum_a = train(str(train_f), str(valid_f), dir_a, None, mcfg, tcfg(3))
    dir_b = str(tmp_path / "resumed")
    train(str(train_f), str(valid_f), dir_b, None, mcfg, tcfg(1))
    sum_b = train(str(train_f), str(valid_f), dir_b, None, mcfg, tcfg(3),
                  resume=True)

    assert sum_b["epochs_run"] == sum_a["epochs_run"] == 3
    assert sum_b["best_accuracy"] == sum_a["best_accuracy"]
    blob_a = open(os.path.join(dir_a, "train_state.ckpt",
                               "variables.msgpack"), "rb").read()
    blob_b = open(os.path.join(dir_b, "train_state.ckpt",
                               "variables.msgpack"), "rb").read()
    assert blob_a == blob_b  # bit-identical params + BN stats
    # opt state too (Adam moments + step counter)
    st_a = open(os.path.join(dir_a, "train_state.ckpt",
                             "train_state.msgpack"), "rb").read()
    st_b = open(os.path.join(dir_b, "train_state.ckpt",
                             "train_state.msgpack"), "rb").read()
    assert st_a == st_b


def test_train_binary_input(tmp_path, rng):
    rows = _fea_rows(rng, 40)
    txt = tmp_path / "t.tsv"
    txt.write_text("\n".join(rows) + "\n")
    binp = tmp_path / "t.bin"
    convert_txt_to_binary(str(txt), str(binp), K, S)
    mcfg = ModelConfig(**TINY)
    tcfg = TrainConfig(batch_size=16, max_epoch_num=1, min_epoch_num=1,
                       display_step=1000)
    summary = train(str(binp), str(binp), str(tmp_path / "m"), None, mcfg,
                    tcfg, is_binary=True)
    assert summary["epochs_run"] == 1


def test_prefetch_batches_order_and_exceptions():
    """Background prefetch must preserve order, yield every item, and
    re-raise producer exceptions at the consumer."""
    from deepsignal_tpu.train.data import prefetch_batches

    assert list(prefetch_batches(iter(range(100)), depth=3)) == \
        list(range(100))
    assert list(prefetch_batches(iter([]))) == []

    def boom():
        yield 1
        yield 2
        raise RuntimeError("producer failed")

    got = []
    try:
        for x in prefetch_batches(boom()):
            got.append(x)
        raise AssertionError("expected RuntimeError")
    except RuntimeError as e:
        assert "producer failed" in str(e)
    assert got == [1, 2]


def test_bf16_train_wire_packing_is_exact(rng):
    """The bf16 train wire format (int8 kmer, bf16 floats, u16 sanums) must
    be numerically IDENTICAL to shipping f32 and casting on device: the
    model casts every float input to compute_dtype at entry, so the host
    RTNE cast commutes with the device one."""
    import dataclasses

    from deepsignal_tpu.core.config import ModelConfig, TrainConfig
    from deepsignal_tpu.train.trainer import Trainer

    mcfg = ModelConfig(lstm_hidden=16, lstm_layers=1, inception_times=1,
                       inception_blocks=(1, 0, 0), cent_signals_len=24,
                       kmer_len=5, compute_dtype="bfloat16",
                       matmul_precision="default")
    tcfg = TrainConfig(batch_size=16, seed=3)
    b = dict(kmer=rng.integers(0, 4, (16, 5)).astype(np.int32),
             means=rng.normal(0, 1, (16, 5)).astype(np.float32),
             stds=np.abs(rng.normal(0, 1, (16, 5))).astype(np.float32),
             sanums=rng.integers(1, 40, (16, 5)).astype(np.float32),
             signals=rng.normal(0, 1, (16, 24)).astype(np.float32),
             labels=rng.integers(0, 2, 16).astype(np.int32))

    t_packed = Trainer(mcfg, tcfg)
    assert t_packed._wire_f is not None
    t_raw = Trainer(mcfg, tcfg)
    t_raw._wire_f = None  # force the unpacked f32 wire

    for step in range(2):
        lp, cp, pp, _ = t_packed.train_on_batch(dict(b), 1e-3)
        lr_, cr, pr, _ = t_raw.train_on_batch(dict(b), 1e-3)
        assert lp == lr_, (step, lp, lr_)
        np.testing.assert_array_equal(cp, cr)
        np.testing.assert_array_equal(pp, pr)

    # the f32 parity config must not pack
    f32 = Trainer(dataclasses.replace(mcfg, compute_dtype="float32",
                                      matmul_precision="highest"), tcfg)
    assert f32._wire_f is None
