"""TF1 checkpoint import mapping: round-trip through TF1-style names."""

import numpy as np
import jax

from deepsignal_tpu.core.config import ModelConfig
from deepsignal_tpu.models.deepsignal import init_model
from deepsignal_tpu.models.tf1_import import (export_tf1_style_arrays,
                                              import_tf1_arrays,
                                              import_tf1_npz)

TINY = ModelConfig(lstm_hidden=8, lstm_layers=2, inception_times=1,
                   inception_blocks=(1, 1, 1), cent_signals_len=24,
                   kmer_len=5)


def _tree_equal(a, b, path=""):
    assert set(a.keys()) == set(b.keys()), \
        f"{path}: {set(a.keys())} != {set(b.keys())}"
    for k in a:
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k], path + "/" + str(k))
        else:
            np.testing.assert_array_equal(np.asarray(a[k]),
                                          np.asarray(b[k]),
                                          err_msg=path + "/" + str(k))


def test_roundtrip_through_tf1_names():
    _, variables = init_model(TINY)
    arrs = export_tf1_style_arrays(variables, TINY)
    # dense kernels, lstm cells, conv kernels + bn stats all present
    assert "dense/kernel" in arrs and "dense_1/kernel" in arrs
    assert "modelem/fw/multi_rnn_cell/cell_0/lstm_cell/kernel" in arrs
    assert any("incp_layer3" in k for k in arrs)
    assert any("moving_variance" in k for k in arrs)

    back = import_tf1_arrays(arrs, TINY)
    _tree_equal(back["params"], jax.device_get(variables["params"]))
    _tree_equal(back["batch_stats"],
                jax.device_get(variables["batch_stats"]))


def test_imported_variables_run(rng):
    from deepsignal_tpu.models.deepsignal import DeepSignalNet
    import jax.numpy as jnp
    _, variables = init_model(TINY)
    arrs = export_tf1_style_arrays(variables, TINY)
    imported = import_tf1_arrays(arrs, TINY)
    model = DeepSignalNet(TINY)
    batch = dict(
        kmer=jnp.asarray(rng.integers(0, 4, (4, 5)), jnp.int32),
        means=jnp.asarray(rng.normal(0, 1, (4, 5)), jnp.float32),
        stds=jnp.asarray(np.abs(rng.normal(0, 1, (4, 5))), jnp.float32),
        sanums=jnp.asarray(rng.integers(1, 40, (4, 5)), jnp.float32),
        signals=jnp.asarray(rng.normal(0, 1, (4, 24)), jnp.float32))
    o1 = jax.jit(lambda v, b: model.apply(v, **b, train=False))(
        variables, batch)
    o2 = jax.jit(lambda v, b: model.apply(v, **b, train=False))(
        {"params": imported["params"],
         "batch_stats": imported["batch_stats"]}, batch)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_npz_roundtrip(tmp_path):
    _, variables = init_model(TINY)
    arrs = export_tf1_style_arrays(variables, TINY)
    npz = tmp_path / "w.npz"
    np.savez(str(npz), **arrs)
    back = import_tf1_npz(str(npz), TINY)
    _tree_equal(back["params"], jax.device_get(variables["params"]))
