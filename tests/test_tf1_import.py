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


def _load_fixture():
    import json
    import os
    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "tf1_variables_bn17_sn360.json")
    with open(path) as f:
        return json.load(f)["variables"]


def _synth_arrays(fixture):
    """Deterministic synthetic arrays with the exact reference names+shapes
    (tf.train.list_variables layout of the published checkpoint)."""
    rng = np.random.default_rng(99)
    return {name: rng.normal(0, 0.1, shape).astype(np.float32)
            for name, shape in fixture.items()}


def _shape_tree(tree, path=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out[k] = _shape_tree(v, path + "/" + str(k))
        else:
            out[k] = tuple(np.shape(v))
    return out


def test_import_from_reference_name_fixture():
    """Import a full-size synthetic checkpoint carrying the EXACT variable
    names+shapes of the published TF1 model (fixture derived from the
    reference graph construction, model.py:27-63 / layers.py:20-264) —
    independent of export_tf1_style_arrays."""
    import jax.numpy as jnp
    from deepsignal_tpu.models.deepsignal import DeepSignalNet

    fixture = _load_fixture()
    arrs = _synth_arrays(fixture)
    cfg = ModelConfig()  # full default bn17/sn360 config
    imported = import_tf1_arrays(arrs, cfg)

    # expected tree WITHOUT materializing the 40M-param model: eval_shape
    model = DeepSignalNet(cfg)
    k, s = cfg.kmer_len, cfg.cent_signals_len
    dummy = dict(kmer=jnp.zeros((2, k), jnp.int32),
                 means=jnp.zeros((2, k), jnp.float32),
                 stds=jnp.zeros((2, k), jnp.float32),
                 sanums=jnp.zeros((2, k), jnp.float32),
                 signals=jnp.zeros((2, s), jnp.float32))
    expected = jax.eval_shape(
        lambda r, b: model.init({"params": r}, b["kmer"], b["means"],
                                b["stds"], b["sanums"], b["signals"],
                                train=False),
        jax.random.PRNGKey(0), dummy)

    got = _shape_tree({"params": imported["params"],
                       "batch_stats": imported["batch_stats"]})
    want = _shape_tree(
        {"params": jax.tree.map(lambda x: np.zeros(x.shape), expected,
                                is_leaf=lambda x: hasattr(x, "shape"))
         ["params"],
         "batch_stats": jax.tree.map(lambda x: np.zeros(x.shape), expected,
                                     is_leaf=lambda x: hasattr(x, "shape"))
         ["batch_stats"]})
    assert got == want

    # full coverage: every checkpoint parameter landed in the tree
    n_fixture = sum(int(np.prod(shape)) for name, shape in
                    _load_fixture().items() if name != "modelglobal_step")
    n_imported = sum(int(np.prod(np.shape(leaf)))
                     for leaf in jax.tree.leaves(imported))
    assert n_imported == n_fixture


def test_import_bidirectional_rnn_scoped_variant():
    """Some TF1 exports scope the stack under an extra bidirectional_rnn/
    level; the substring-matched importer must accept them identically."""
    fixture = _load_fixture()
    arrs = _synth_arrays(fixture)
    renamed = {}
    for name, arr in arrs.items():
        if "/multi_rnn_cell/" in name:
            name = name.replace("modelem/",
                                "modelem/bidirectional_rnn/")
        renamed[name] = arr
    a = import_tf1_arrays(arrs, ModelConfig())
    b = import_tf1_arrays(renamed, ModelConfig())
    for pa, pb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(pa, pb)
