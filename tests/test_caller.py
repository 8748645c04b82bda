"""Checkpoint round-trip + calling engine (call_modifications.py contracts)."""

import numpy as np
import pytest

from deepsignal_tpu.core.config import ModelConfig
from deepsignal_tpu.io.feature_codec import parse_feature_lines
from deepsignal_tpu.models.deepsignal import init_model
from deepsignal_tpu.runtime.caller import ModCaller, call_mods_on_batches
from deepsignal_tpu.train.checkpoints import (clean_model_dir, ckpt_name,
                                              latest_checkpoint,
                                              load_checkpoint,
                                              save_checkpoint)

TINY = dict(lstm_hidden=8, lstm_layers=1, inception_times=1,
            inception_blocks=(1, 1, 1),
            cent_signals_len=24, kmer_len=5)


def _rows(rng, n=10, kmer_len=5, signal_len=24):
    from tests.test_codecs import _mk_row  # reuse the row factory
    del _mk_row
    rows = []
    bases = np.array(list("ACGT"))
    for i in range(n):
        kmer = "".join(bases[rng.integers(0, 4, kmer_len)])
        means = np.around(rng.normal(0, 1, kmer_len), 6)
        stds = np.around(np.abs(rng.normal(0, 1, kmer_len)), 6)
        lens = rng.integers(1, 50, kmer_len)
        cent = np.around(rng.normal(0, 1, signal_len), 6)
        rows.append("\t".join(
            ["chr1", str(100 + i), "+", str(100 + i), f"read{i // 4}", "t",
             kmer,
             ",".join(str(x) for x in means),
             ",".join(str(x) for x in stds),
             ",".join(str(int(x)) for x in lens),
             ",".join(str(x) for x in cent), "1"]))
    return rows


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    cfg = ModelConfig(**TINY)
    _, variables = init_model(cfg)
    path = tmp_path_factory.mktemp("model") / ckpt_name(5, 24, 0)
    save_checkpoint(str(path), cfg, variables, meta={"epoch": 0})
    return str(path)


def test_checkpoint_roundtrip(tiny_ckpt):
    cfg, variables = load_checkpoint(tiny_ckpt)
    assert cfg.kmer_len == 5 and cfg.cent_signals_len == 24
    assert "params" in variables and "batch_stats" in variables
    emb = variables["params"]["embedding"]
    assert emb.shape == (1024, 128)
    assert np.asarray(emb).std() > 0  # real values, not zeros


def test_latest_and_clean(tmp_path):
    cfg = ModelConfig(**TINY)
    _, variables = init_model(cfg)
    for e in (0, 2, 1):
        save_checkpoint(str(tmp_path / ckpt_name(5, 24, e)), cfg, variables)
    latest = latest_checkpoint(str(tmp_path), 5, 24)
    assert latest.endswith("epoch_2.ckpt")
    removed = clean_model_dir(str(tmp_path), 5, 24)
    assert removed == 3
    assert latest_checkpoint(str(tmp_path), 5, 24) is None


def test_caller_output_contract(tiny_ckpt, rng, tmp_path):
    cfg, variables = load_checkpoint(tiny_ckpt)
    caller = ModCaller(cfg, variables, batch_size=4)
    fb = parse_feature_lines(_rows(rng, n=10))
    rows, preds, (p0, p1) = caller.call_feature_batch(fb)
    assert len(rows) == 10
    assert preds.shape == (10,)
    np.testing.assert_allclose(p0 + p1, 1.0, rtol=1e-5)
    w = rows[0].split("\t")
    assert len(w) == 10
    assert w[4] == "read0"
    assert int(w[8]) in (0, 1)
    assert len(w[9]) == 5
    # padding path: batch of 10 with batch_size 4 pads the final chunk of 2;
    # scoring must be independent of padding
    caller8 = ModCaller(cfg, variables, batch_size=8)
    rows8, preds8, (q0, q1) = caller8.call_feature_batch(fb)
    np.testing.assert_allclose(p0, q0, atol=1e-6)
    np.testing.assert_array_equal(preds, preds8)


def test_call_mods_on_batches_writes_file(tiny_ckpt, rng, tmp_path):
    cfg, variables = load_checkpoint(tiny_ckpt)
    caller = ModCaller(cfg, variables, batch_size=4)
    feats = tmp_path / "f.tsv"
    feats.write_text("\n".join(_rows(rng, n=7)) + "\n")
    from deepsignal_tpu.io.feature_codec import iter_feature_batches_by_read
    out = tmp_path / "calls.tsv"
    n = call_mods_on_batches(
        caller, iter_feature_batches_by_read(str(feats), 2), str(out))
    assert n == 7
    lines = out.read_text().splitlines()
    assert len(lines) == 7
    # rows preserve input order (read grouping contract)
    assert [l.split("\t")[1] for l in lines] == [str(100 + i)
                                                for i in range(7)]


def test_coalesce_feature_batches(rng):
    from deepsignal_tpu.runtime.caller import coalesce_feature_batches
    fbs = [parse_feature_lines(_rows(rng, n=n)) for n in (3, 5, 2, 7, 1)]
    out = list(coalesce_feature_batches(iter(fbs), 4))
    assert [len(b) for b in out] == [4, 4, 4, 4, 2]
    flat_in = [s for b in fbs for s in b.sampleinfo]
    flat_out = [s for b in out for s in b.sampleinfo]
    assert flat_out == flat_in  # order preserved, nothing lost
    kin = np.concatenate([b.kmers for b in fbs])
    kout = np.concatenate([b.kmers for b in out])
    np.testing.assert_array_equal(kin, kout)


def test_wire_packing_is_exact_f32(tiny_ckpt, rng):
    """int8-kmer/uint16-sanums wire packing must be bit-identical to the
    float32 reference path (the pack is lossless for f32 compute)."""
    import jax

    cfg, variables = load_checkpoint(tiny_ckpt)
    caller = ModCaller(cfg, variables, batch_size=8)
    fb = parse_feature_lines(_rows(rng, n=8))
    _, preds, (p0, p1) = caller.call_feature_batch(fb)

    # unpacked oracle: apply the model directly on float32/int32 inputs
    logits = caller.model.apply(
        caller.variables, fb.kmers.astype(np.int32),
        fb.means, fb.stds, fb.lens.astype(np.float32), fb.signals,
        train=False)
    act = np.asarray(jax.nn.sigmoid(logits))
    tot = act[:, 0] + act[:, 1]
    np.testing.assert_array_equal(p0, act[:, 0] / tot)
    np.testing.assert_array_equal(p1, act[:, 1] / tot)


def test_wire_packing_bf16_matches_device_cast(tiny_ckpt, rng):
    """bf16 wire format (host-side RTNE cast) must equal the on-device
    f32->bf16 cast the model performs on the f32 path."""
    import dataclasses

    import jax.numpy as jnp

    cfg, variables = load_checkpoint(tiny_ckpt)
    cfg16 = dataclasses.replace(cfg, compute_dtype="bfloat16",
                                matmul_precision="default")
    caller = ModCaller(cfg16, variables, batch_size=8)
    assert caller._wire_f == np.dtype(jnp.bfloat16)
    fb = parse_feature_lines(_rows(rng, n=8))
    _, preds, (p0, p1) = caller.call_feature_batch(fb)

    # oracle: f32 inputs into the same bf16-compute model (device cast)
    logits = caller.model.apply(
        caller.variables, fb.kmers.astype(np.int32),
        fb.means, fb.stds, fb.lens.astype(np.float32), fb.signals,
        train=False)
    import jax
    act = np.asarray(jax.nn.sigmoid(logits))
    tot = act[:, 0] + act[:, 1]
    np.testing.assert_array_equal(p0, act[:, 0] / tot)
    np.testing.assert_array_equal(p1, act[:, 1] / tot)
