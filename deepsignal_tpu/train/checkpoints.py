"""Model checkpointing.

Reference behavior (train_model.py:33-47,239-243; SURVEY.md §5.4): TF1 Saver
checkpoints named ``bn_{kmer}.sn_{signals}.epoch_{n}.ckpt``, previous
checkpoints deleted at train start, saved on new global-best validation
accuracy.  Here a checkpoint is a directory containing:

- ``config.json``      — the ModelConfig (so loaders don't guess shapes)
- ``variables.msgpack`` — flax-serialized {params, batch_stats}
- ``meta.json``        — epoch / metric bookkeeping (optional)

Beyond the reference (SURVEY.md §5.4 target): ``save_train_state`` /
``load_train_state`` persist the full training state — variables, optimizer
state, model/data RNG, epoch counters — into a rolling ``train_state.ckpt``
dir so an interrupted run resumes identically to an unbroken one (the
reference restarts training from scratch every time).
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
import shutil
from typing import Optional, Tuple

import flax.serialization
import jax

from ..core.config import ModelConfig


def ckpt_name(kmer_len: int, signal_len: int, epoch: int) -> str:
    return f"bn_{kmer_len}.sn_{signal_len}.epoch_{epoch}.ckpt"


def ckpt_regex(kmer_len: int, signal_len: int) -> re.Pattern:
    return re.compile(r"bn_" + str(kmer_len) + r"\.sn_" + str(signal_len)
                      + r"\.epoch_\d+\.ckpt*")


def clean_model_dir(model_dir: str, kmer_len: int, signal_len: int) -> int:
    """Delete pre-existing checkpoints matching the naming scheme
    (train_model.py:37-47); returns the number removed."""
    if not os.path.exists(model_dir):
        os.makedirs(model_dir)
        return 0
    regex = ckpt_regex(kmer_len, signal_len)
    count = 0
    for mfile in os.listdir(model_dir):
        if regex.match(mfile) or mfile == "checkpoint":
            full = os.path.join(model_dir, mfile)
            if os.path.isdir(full):
                shutil.rmtree(full)
            else:
                os.remove(full)
            count += 1
    return count


def save_checkpoint(path: str, cfg: ModelConfig, variables,
                    meta: Optional[dict] = None) -> str:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=1)
    variables = jax.device_get(variables)
    with open(os.path.join(path, "variables.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(variables))
    if meta is not None:
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f, indent=1)
    return path


def load_checkpoint(path: str,
                    cfg: Optional[ModelConfig] = None
                    ) -> Tuple[ModelConfig, dict]:
    """Load (cfg, variables).  ``path`` is the checkpoint directory (the
    analogue of the reference's ckpt prefix, README.md:107)."""
    with open(os.path.join(path, "config.json")) as f:
        cfg_dict = json.load(f)
    loaded_cfg = ModelConfig(**cfg_dict)
    if cfg is not None:
        loaded_cfg = cfg
    # abstract template via eval_shape — no XLA compile on the load path
    from ..models.deepsignal import DeepSignalNet
    import jax.numpy as jnp
    model = DeepSignalNet(loaded_cfg)
    k, s = loaded_cfg.kmer_len, loaded_cfg.cent_signals_len
    batch = dict(kmer=jax.ShapeDtypeStruct((2, k), jnp.int32),
                 means=jax.ShapeDtypeStruct((2, k), jnp.float32),
                 stds=jax.ShapeDtypeStruct((2, k), jnp.float32),
                 sanums=jax.ShapeDtypeStruct((2, k), jnp.float32),
                 signals=jax.ShapeDtypeStruct((2, s), jnp.float32))
    template = jax.eval_shape(
        lambda r, b: model.init(r, b["kmer"], b["means"], b["stds"],
                                b["sanums"], b["signals"], train=False),
        jax.random.PRNGKey(0), batch)
    with open(os.path.join(path, "variables.msgpack"), "rb") as f:
        variables = flax.serialization.from_bytes(template, f.read())
    return loaded_cfg, variables


TRAIN_STATE_DIRNAME = "train_state.ckpt"


def save_train_state(model_dir: str, cfg: ModelConfig, variables, opt_state,
                     rng, meta: dict) -> str:
    """Write the rolling full-train-state checkpoint (atomic via tmp+rename).

    ``meta`` must carry the loop bookkeeping (next_epoch, test_accu_best,
    step, shuffle_state, ...) — everything json-serializable lives there;
    array state (variables, opt_state, rng key) goes into msgpack blobs.
    """
    path = os.path.join(model_dir, TRAIN_STATE_DIRNAME)
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    save_checkpoint(tmp, cfg, variables, meta=meta)
    state = {"opt_state": jax.device_get(opt_state),
             "rng": jax.device_get(rng)}
    with open(os.path.join(tmp, "train_state.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(state))
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)
    return path


def load_train_state(model_dir: str, opt_state_template, rng_template):
    """Load (cfg, variables, opt_state, rng, meta) from the rolling
    train-state checkpoint, or None when absent.  Templates supply the
    pytree structure for msgpack deserialization (a fresh ``tx.init`` and
    ``PRNGKey``)."""
    path = os.path.join(model_dir, TRAIN_STATE_DIRNAME)
    if not os.path.isdir(path):
        return None
    cfg, variables = load_checkpoint(path)
    template = {"opt_state": opt_state_template, "rng": rng_template}
    with open(os.path.join(path, "train_state.msgpack"), "rb") as f:
        state = flax.serialization.from_bytes(template, f.read())
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return cfg, variables, state["opt_state"], state["rng"], meta


def clear_train_state(model_dir: str) -> None:
    path = os.path.join(model_dir, TRAIN_STATE_DIRNAME)
    if os.path.isdir(path):
        shutil.rmtree(path)


def latest_checkpoint(model_dir: str, kmer_len: int,
                      signal_len: int) -> Optional[str]:
    """Highest-epoch checkpoint in a model dir, or None."""
    regex = ckpt_regex(kmer_len, signal_len)
    best, best_epoch = None, -1
    if not os.path.isdir(model_dir):
        return None
    for mfile in os.listdir(model_dir):
        if regex.match(mfile):
            epoch = int(mfile.split(".epoch_")[1].split(".")[0])
            if epoch > best_epoch:
                best, best_epoch = mfile, epoch
    return os.path.join(model_dir, best) if best else None
