"""Sharded training loop.

Re-design of ``deepsignal/train_model.py:24-285`` for TPU:

- one jitted ``train_step`` (Adam, weighted CE, dropout, BN stat updates)
  compiled for a fixed [batch_size, ...] shape; partial tail batches are
  padded and masked instead of reshaping
- on a device mesh the batch is sharded along the data axis with params
  replicated — XLA inserts the psum gradient reduction (the reference trains
  strictly single-device, train_model.py:112)
- reference semantics preserved: LR schedule = lr for epochs 0-1 else
  lr*decay_rate (train_model.py:123-126); every ``display_step`` iterations a
  full validation sweep + train.txt/valid.txt log lines in the reference's
  parseable format (train_model.py:186-189,233-236); checkpoint on new
  global-best validation accuracy (train_model.py:239-243); early stop when
  an epoch fails to improve and epoch_id >= min_epoch_num-1
  (train_model.py:270-284).
"""

from __future__ import annotations

import os
import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.config import ModelConfig, TrainConfig
from ..models.deepsignal import (DeepSignalNet, init_model, predictions,
                                 weighted_ce_with_logits)
from ..parallel.mesh import (batch_sharding, mesh_is_multiprocess,
                             param_shardings, put_batch, put_replicated,
                             replicated)
from ..runtime.caller import compact_wire_arrays
from .checkpoints import (ckpt_name, clean_model_dir, clear_train_state,
                          load_train_state, save_checkpoint, save_train_state)
from .data import open_dataset, prefetch_batches
from .metrics import counts_to_metrics

TRAIN_LOG = "train.txt"
VALID_LOG = "valid.txt"


def masked_mean_loss(logits, labels, valid_mask, class_num: int,
                     pos_weight: float):
    """Reference cost (model.py:105-118) with padded-lane masking.

    pos_weight == 1: elementwise weighted CE over the one-hot [B, C] grid,
    mean over valid elements.  Otherwise the scalar class-1-logit form."""
    if pos_weight == 1.0:
        one_hot = jax.nn.one_hot(labels, class_num, dtype=logits.dtype)
        loss = weighted_ce_with_logits(logits, one_hot, pos_weight)
        w = valid_mask[:, None].astype(loss.dtype)
        return jnp.sum(loss * w) / (jnp.sum(w) * class_num)
    loss = weighted_ce_with_logits(logits[:, 1], labels.astype(logits.dtype),
                                   pos_weight)
    w = valid_mask.astype(loss.dtype)
    return jnp.sum(loss * w) / jnp.sum(w)


def metric_counts(preds, labels, valid_mask):
    """Device-side [valid, correct, tp, fp, fn] over the global batch.

    Summing a batch-sharded boolean across the data axis makes XLA insert
    the psum, so the result is replicated and identical on every host (the
    multi-host lockstep requirement — see metrics.counts_to_metrics)."""
    m = valid_mask > 0
    pos_t = labels == 1
    pos_p = preds == 1
    return jnp.stack([
        jnp.sum(m.astype(jnp.int32)),
        jnp.sum(((preds == labels) & m).astype(jnp.int32)),
        jnp.sum((pos_t & pos_p & m).astype(jnp.int32)),
        jnp.sum((~pos_t & pos_p & m).astype(jnp.int32)),
        jnp.sum((pos_t & ~pos_p & m).astype(jnp.int32)),
    ])


class _StagedBatch(tuple):
    """Marker for a batch already placed on device by ``stage_batch``."""

    def __new__(cls, batch, mask, valid):
        return super().__new__(cls, (batch, mask, valid))


class Trainer:
    """Owns model variables, optimizer state and the jitted steps."""

    def __init__(self, model_cfg: ModelConfig, train_cfg: TrainConfig,
                 mesh=None, rng: Optional[jax.Array] = None):
        self.mcfg = model_cfg
        self.tcfg = train_cfg
        self.mesh = mesh
        self.model = DeepSignalNet(model_cfg)
        rng = rng if rng is not None else jax.random.PRNGKey(train_cfg.seed)
        self.rng, init_rng = jax.random.split(rng)
        _, variables = init_model(model_cfg, init_rng,
                                 batch_size=train_cfg.batch_size)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.tx = optax.inject_hyperparams(optax.adam)(
            learning_rate=train_cfg.learning_rate)
        self.opt_state = self.tx.init(self.params)
        self._step_counter = 0
        # Compact wire format on the bfloat16 path (same contract as
        # ModCaller): the model casts every float input to compute_dtype at
        # entry (models/deepsignal.py:46-50), so shipping bf16 (RTNE host
        # cast) is bit-identical to shipping f32 and casting on device —
        # while halving the per-step h2d bytes (1716 -> 855 B/site), which
        # binds exactly where the link is slow.  The f32 parity path ships
        # f32 untouched.
        self._wire_f = (np.dtype(jnp.bfloat16)
                        if jnp.dtype(model_cfg.compute_dtype) == jnp.bfloat16
                        else None)

        mcfg = model_cfg
        tcfg = train_cfg
        model = self.model
        tx = self.tx

        def train_step(params, batch_stats, opt_state, batch, valid_mask,
                       dropout_rng, lr):
            opt_state.hyperparams["learning_rate"] = lr
            batch = dict(batch, kmer=batch["kmer"].astype(jnp.int32))

            def loss_fn(p):
                logits, new_vars = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    batch["kmer"], batch["means"], batch["stds"],
                    batch["sanums"], batch["signals"], train=True,
                    keep_prob=tcfg.keep_prob, mutable=["batch_stats"],
                    rngs={"dropout": dropout_rng})
                loss = masked_mean_loss(logits, batch["labels"], valid_mask,
                                        mcfg.class_num, tcfg.pos_weight)
                return loss, (logits, new_vars["batch_stats"])

            (loss, (logits, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            preds = predictions(logits, tcfg.pos_weight)
            counts = metric_counts(preds, batch["labels"], valid_mask)
            return params, new_bs, opt_state, loss, counts, preds

        def eval_step(params, batch_stats, batch, valid_mask):
            batch = dict(batch, kmer=batch["kmer"].astype(jnp.int32))
            logits = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["kmer"], batch["means"], batch["stds"],
                batch["sanums"], batch["signals"], train=False)
            loss = masked_mean_loss(logits, batch["labels"], valid_mask,
                                    mcfg.class_num, tcfg.pos_weight)
            probs1 = jax.nn.sigmoid(logits[:, 1])
            preds = predictions(logits, tcfg.pos_weight)
            counts = metric_counts(preds, batch["labels"], valid_mask)
            return loss, counts, preds, probs1

        self._multiproc = mesh is not None and mesh_is_multiprocess(mesh)
        self._p_shard = None
        if mesh is not None:
            data = batch_sharding(mesh)
            repl = replicated(mesh)
            batch_shard = {k: data for k in ("kmer", "means", "stds",
                                             "sanums", "signals", "labels")}
            if self._multiproc:
                # Multi-host: dp only — params fully replicated so every
                # host can contribute them via put_replicated.
                p_shard = jax.tree.map(lambda _: repl, self.params)
                self.params = put_replicated(self.params, mesh)
                self.batch_stats = put_replicated(self.batch_stats, mesh)
                self.opt_state = put_replicated(self.opt_state, mesh)
            else:
                # Single-process mesh: dp + optional tp (joint-head kernels
                # sharded over the model axis when the mesh has one).
                p_shard = param_shardings(mesh, self.params)
                self.params = jax.device_put(self.params, p_shard)
                self.batch_stats = jax.device_put(self.batch_stats, repl)
                # jitted init propagates the param shardings onto the
                # mirrored adam mu/nu trees
                self.opt_state = jax.jit(tx.init)(self.params)
            self._p_shard = p_shard
            # Host-read outputs replicated: preds/probs are batch-sharded
            # when computed, so XLA inserts one all_gather of [B] scalars —
            # negligible, and it makes every host see the GLOBAL batch's
            # results (the multi-host lockstep requirement).  Optimizer-state
            # shardings are inferred from the passed-in state (None entries).
            self._train_step = jax.jit(
                train_step,
                in_shardings=(p_shard, repl, None, batch_shard, data, repl,
                              repl),
                out_shardings=(p_shard, repl, None, repl, repl, repl),
                donate_argnums=(0, 1, 2))
            self._eval_step = jax.jit(
                eval_step,
                in_shardings=(p_shard, repl, batch_shard, data),
                out_shardings=(repl, repl, repl, repl))
        else:
            self._train_step = jax.jit(train_step, donate_argnums=(0, 1, 2))
            self._eval_step = jax.jit(eval_step)

    # -- step wrappers ------------------------------------------------------

    def stage_batch(self, batch):
        """Start the host->device transfer of a batch NOW; returns a staged
        handle accepted by the *_on_batch methods.

        Called from the prefetch thread (train/_validate/denoise wrap their
        batch iterators in ``map(trainer.stage_batch, ...)`` before
        ``prefetch_batches``), so the h2d transfer of batch i+1 overlaps
        step i's compute instead of serializing with it at dispatch — the
        exact double-buffering ModCaller does for inference
        (runtime/caller.py:_run_fixed).  On a slow link this is the
        difference between ms/step ~= pure step and ms/step = step + full
        transfer latency (measured 3.6 s/step -> ~0.2 s through the bench
        tunnel at batch 4096)."""
        got = self._device_batch(dict(batch))
        if self._multiproc:
            return _StagedBatch(*got)  # put_batch already placed it
        b, mask, valid = got
        if self.mesh is None:
            return _StagedBatch(jax.device_put(b), jax.device_put(mask),
                                valid)
        data = batch_sharding(self.mesh)
        return _StagedBatch(
            jax.device_put(b, {k: data for k in b}),
            jax.device_put(mask, data), valid)

    def _device_batch(self, batch):
        """Global host batch -> jit-ready (batch, mask, valid).

        Every process sees the SAME global batch (shared train file + same
        shuffle seed).  Single-process: feed it straight to jit.
        Multi-process: each process slices its contiguous block of rows and
        contributes it via ``put_batch`` (jax.make_array_from_process_local_
        data) — a jit over a global mesh rejects host-local numpy with
        global in_shardings.  Contiguous blocks (not stride) keep the padded
        tail at the end of the reassembled global array, so ``[:valid]``
        slicing of gathered outputs stays correct.
        """
        valid = batch.pop("__valid__") if "__valid__" in batch else \
            batch["labels"].shape[0]
        n = batch["labels"].shape[0]
        mask = np.zeros(n, dtype=np.float32)
        mask[:valid] = 1.0
        if self._wire_f is not None:
            kmer, means, stds, sanums, signals = compact_wire_arrays(
                batch["kmer"], batch["means"], batch["stds"],
                batch["sanums"], batch["signals"], self._wire_f)
            batch = dict(kmer=kmer, means=means, stds=stds, sanums=sanums,
                         signals=signals, labels=batch["labels"])
        if not self._multiproc:
            return batch, mask, valid
        nproc = jax.process_count()
        if n % nproc:
            raise ValueError(f"global batch {n} not divisible by "
                             f"{nproc} processes")
        bl = n // nproc
        lo = jax.process_index() * bl
        local = {k: v[lo:lo + bl] for k, v in batch.items()}
        data = batch_sharding(self.mesh)
        return (put_batch(local, data), put_batch(mask[lo:lo + bl], data),
                valid)

    def _repl(self, x):
        """Per-call replicated scalars (lr, dropout key): identical on every
        process by construction (same seed / same schedule)."""
        if not self._multiproc:
            return x
        return put_replicated(np.asarray(x), self.mesh)

    def train_on_batch_async(self, batch, lr: float):
        """Dispatch one optimizer step; return an opaque metrics handle.

        The step is enqueued and the device->host copies of its (tiny)
        loss/counts/preds outputs are started immediately, so by the time
        ``resolve_metrics`` is called — ideally after the NEXT step has been
        dispatched — the values are already host-side.  A synchronous fetch
        per step costs a full link round trip on top of the step itself
        (measured 430 vs 124 ms/step through the bench tunnel); deferring
        the fetch by one step hides it behind compute."""
        if isinstance(batch, _StagedBatch):
            batch, mask, valid = batch
        else:
            batch, mask, valid = self._device_batch(dict(batch))
        self.rng, drop = jax.random.split(self.rng)
        (self.params, self.batch_stats, self.opt_state, loss, counts,
         preds) = self._train_step(self.params, self.batch_stats,
                                   self.opt_state, batch, mask,
                                   self._repl(drop),
                                   self._repl(jnp.float32(lr)))
        for out in (loss, counts, preds):
            try:
                out.copy_to_host_async()
            except Exception:  # pure optimization (multi-device arrays on
                break          # some backends don't support it)
        return loss, counts, preds, valid

    @staticmethod
    def resolve_metrics(handle):
        """(loss, counts, preds[:valid], valid) from an async handle."""
        loss, counts, preds, valid = handle
        return (float(loss), np.asarray(counts), np.asarray(preds)[:valid],
                valid)

    def train_on_batch(self, batch, lr: float):
        """Returns (loss, counts, preds[:valid], valid) for the GLOBAL batch;
        identical on every host.  Synchronous convenience wrapper."""
        return self.resolve_metrics(self.train_on_batch_async(batch, lr))

    def eval_on_batch_async(self, batch):
        """Dispatch one eval step with async host copies (see
        ``train_on_batch_async``); resolve with ``resolve_eval``."""
        if isinstance(batch, _StagedBatch):
            batch, mask, valid = batch
        else:
            batch, mask, valid = self._device_batch(dict(batch))
        loss, counts, preds, probs1 = self._eval_step(
            self.params, self.batch_stats, batch, mask)
        for out in (loss, counts, preds, probs1):
            try:
                out.copy_to_host_async()
            except Exception:
                break
        return loss, counts, preds, probs1, valid

    @staticmethod
    def resolve_eval(handle):
        loss, counts, preds, probs1, valid = handle
        return (float(loss), np.asarray(counts), np.asarray(preds)[:valid],
                np.asarray(probs1)[:valid], valid)

    def eval_on_batch(self, batch):
        return self.resolve_eval(self.eval_on_batch_async(batch))

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}

    def _put(self, tree):
        if self.mesh is not None:
            return put_replicated(tree, self.mesh)
        return jax.device_put(tree)

    def restore(self, variables, opt_state, rng) -> None:
        """Restore full training state (params, BN stats, optimizer, RNG),
        re-placed on the trainer's mesh/device."""
        if self.mesh is not None and not self._multiproc:
            self.params = jax.device_put(variables["params"], self._p_shard)
        else:
            self.params = self._put(variables["params"])
        self.batch_stats = self._put(variables.get("batch_stats", {}))
        self.opt_state = self._put(opt_state)
        self.rng = jnp.asarray(rng)

    def epoch_lr(self, epoch_id: int) -> float:
        """Single-step LR decay (train_model.py:123-126)."""
        if epoch_id in (0, 1):
            return self.tcfg.learning_rate
        return self.tcfg.learning_rate * self.tcfg.decay_rate


def train(train_file: str, valid_file: str, model_dir: str,
          log_dir: Optional[str], model_cfg: ModelConfig,
          train_cfg: TrainConfig, is_binary: bool = False, mesh=None,
          trainer: Optional[Trainer] = None, resume: bool = False) -> dict:
    """Full training driver with reference logging/checkpoint semantics.

    ``resume=True`` continues from the rolling train-state checkpoint in
    ``model_dir`` (params + optimizer state + RNG + shuffle stream + epoch
    counters), reproducing an unbroken run exactly; falls back to a fresh
    start when no state exists.  Returns a summary dict
    {best_accuracy, epochs_run, model_path}.
    """
    train_start = time.time()
    tcfg = train_cfg
    mcfg = model_cfg

    if trainer is None:
        trainer = Trainer(mcfg, tcfg, mesh=mesh)
    shuffle_rng = np.random.default_rng(tcfg.seed)
    # Multi-host: every process computes identical (replicated) metrics and
    # therefore identical checkpoint/early-stop decisions; only process 0
    # touches the shared filesystem.
    is_lead = jax.process_index() == 0

    start_epoch = 0
    test_accu_best = 0.0
    best_path = None
    epochs_run = 0

    state = (load_train_state(model_dir, trainer.opt_state, trainer.rng)
             if resume else None)
    if state is not None:
        _cfg, variables, opt_state, rng, meta = state
        trainer.restore(variables, opt_state, rng)
        start_epoch = int(meta["next_epoch"])
        test_accu_best = float(meta["test_accu_best"])
        best_path = meta.get("best_path")
        epochs_run = int(meta.get("epochs_run", start_epoch))
        shuffle_rng.bit_generator.state = meta["shuffle_state"]
        print(f"resuming training from epoch {start_epoch} "
              f"(best accuracy so far: {test_accu_best:.3f})")
    elif is_lead:
        removed = clean_model_dir(model_dir, mcfg.kmer_len,
                                  mcfg.cent_signals_len)
        clear_train_state(model_dir)
        if removed:
            print(f"the previous model ({removed} files) in model_directory "
                  "deleted...")
        if log_dir is not None:
            os.makedirs(log_dir, exist_ok=True)
            for name in (TRAIN_LOG, VALID_LOG):
                p = os.path.join(log_dir, name)
                if os.path.exists(p):
                    os.remove(p)

    train_ds = open_dataset(train_file, is_binary, mcfg.kmer_len,
                            mcfg.cent_signals_len)
    valid_ds = open_dataset(valid_file, is_binary, mcfg.kmer_len,
                            mcfg.cent_signals_len)

    for epoch_id in range(start_epoch, tcfg.max_epoch_num):
        start = time.time()
        lr = trainer.epoch_lr(epoch_id)
        tr_loss, tr_acc, tr_rec, tr_prec = [], [], [], []
        test_accu_best_ep = 0.0
        sweeps_run = 0
        iter_id = 0
        # Metrics are consumed ONE step behind the dispatch: the d2h fetch
        # of step i's loss/counts then overlaps step i+1's compute instead
        # of adding a full link round trip per step (measured 430 -> ~150
        # ms/step through the bench tunnel).  Values and their iteration
        # attribution are unchanged; a display-step validation therefore
        # sees params one step newer than the reference's boundary, which
        # only shifts WHEN validation runs, not what is logged.
        pending = None  # (iter_id of the dispatched step, metrics handle)

        def consume(iid, handle, params_iter):
            # ``params_iter``: how many optimizer steps trainer.variables
            # reflect at this moment — one MORE than ``iid`` when consuming
            # one step behind dispatch, equal on the epoch-final drain.
            # Recorded in checkpoint meta so resumed/compared runs are not
            # silently off by one step (the validated/saved params are the
            # ``params_iter``-step params; ``iid`` is the metric attribution).
            nonlocal tr_loss, tr_acc, tr_rec, tr_prec
            nonlocal test_accu_best_ep, sweeps_run, best_path, start
            loss, counts, _preds, _valid = trainer.resolve_metrics(handle)
            acc, rec, prec = counts_to_metrics(counts, mcfg.class_num)
            tr_loss.append(loss)
            tr_acc.append(acc)
            tr_rec.append(rec)
            tr_prec.append(prec)

            if iid % tcfg.display_step == 0:
                if log_dir is not None and is_lead:
                    with open(os.path.join(log_dir, TRAIN_LOG), "a") as f:
                        f.write("epoch:%d, iterid:%d, loss:%.3f, "
                                "accuracy:%.3f, recall:%.3f, precision:%.3f\n"
                                % (epoch_id, iid, np.mean(tr_loss),
                                   np.mean(tr_acc), np.mean(tr_rec),
                                   np.mean(tr_prec)))
                va_loss, va_acc, va_rec, va_prec = _validate(
                    trainer, valid_ds, tcfg, mcfg)
                sweeps_run += 1
                if log_dir is not None and is_lead:
                    with open(os.path.join(log_dir, VALID_LOG), "a") as f:
                        f.write("epoch:%d, iterid:%d, loss:%.3f, "
                                "accuracy:%.3f, recall:%.3f, precision:%.3f\n"
                                % (epoch_id, iid, va_loss, va_acc,
                                   va_rec, va_prec))
                if va_acc > test_accu_best_ep:
                    test_accu_best_ep = va_acc
                    if test_accu_best_ep > test_accu_best:
                        best_path = os.path.join(
                            model_dir, ckpt_name(mcfg.kmer_len,
                                                 mcfg.cent_signals_len,
                                                 epoch_id))
                        if is_lead:
                            save_checkpoint(best_path, mcfg,
                                            trainer.variables,
                                            meta={"epoch": epoch_id,
                                                  "iter": iid,
                                                  "params_iter": params_iter,
                                                  "valid_accuracy": va_acc})
                end = time.time()
                sys.stdout.write(
                    "epoch: %d, iterid: %d\n train_loss: %.3f, valid_loss: "
                    "%.3f, train_accuracy: %.3f, valid_accuracy: %.3f, "
                    "curr_epoch_best_accuracy: %.3f, time_cost: %.2fs\n"
                    % (epoch_id, iid, np.mean(tr_loss), va_loss,
                       np.mean(tr_acc), va_acc, test_accu_best_ep,
                       end - start))
                sys.stdout.flush()
                tr_loss, tr_acc, tr_rec, tr_prec = [], [], [], []
                start = time.time()

        # one-batch-ahead background gather + device staging: the memmap
        # index + pack work AND the h2d transfer overlap the dispatched
        # step instead of serializing with it
        for batch in prefetch_batches(
                map(trainer.stage_batch,
                    train_ds.batches(tcfg.batch_size,
                                     shuffle_rng=shuffle_rng))):
            handle = trainer.train_on_batch_async(batch, lr)
            iter_id += 1
            if pending is not None:
                consume(*pending, params_iter=iter_id)
            pending = (iter_id, handle)
        if pending is not None:
            consume(*pending, params_iter=pending[0])

        # The reference's improvement check uses only display-step sweeps
        # (train_model.py:270-284) — an epoch with < display_step iterations
        # would never validate or checkpoint.  Deliberate deviation: when NO
        # sweep fired this epoch, run one epoch-final validation so short
        # datasets still drive checkpointing/early-stop.
        if sweeps_run == 0:
            _, test_accu_best_ep, _, _ = _validate(trainer, valid_ds, tcfg,
                                                   mcfg)
            if test_accu_best_ep > test_accu_best:
                best_path = os.path.join(
                    model_dir, ckpt_name(mcfg.kmer_len, mcfg.cent_signals_len,
                                         epoch_id))
                if is_lead:
                    save_checkpoint(best_path, mcfg, trainer.variables,
                                    meta={"epoch": epoch_id,
                                          "valid_accuracy":
                                              test_accu_best_ep})
        epochs_run = epoch_id + 1
        improved = test_accu_best_ep > test_accu_best
        if improved:
            test_accu_best = test_accu_best_ep
        sys.stdout.write("================ epoch %d best accuracy: %.3f, "
                         "best accuracy: %.3f\n"
                         % (epoch_id, test_accu_best_ep, test_accu_best))
        sys.stdout.flush()
        if is_lead and tcfg.save_state:
            save_train_state(
                model_dir, mcfg, trainer.variables, trainer.opt_state,
                trainer.rng,
                meta={"next_epoch": epoch_id + 1,
                      "test_accu_best": test_accu_best,
                      "best_path": best_path, "epochs_run": epochs_run,
                      "shuffle_state": shuffle_rng.bit_generator.state})
        if not improved and epoch_id >= tcfg.min_epoch_num - 1:
            break

    sys.stdout.write("training finished, costs %.1f seconds..\n"
                     % (time.time() - train_start))
    return {"best_accuracy": test_accu_best, "epochs_run": epochs_run,
            "model_path": best_path}


def _validate(trainer: Trainer, valid_ds, tcfg: TrainConfig,
              mcfg: ModelConfig):
    losses, accs, recs, precs = [], [], [], []

    def consume(handle):
        loss, counts, _preds, _probs, _valid = trainer.resolve_eval(handle)
        acc, rec, prec = counts_to_metrics(counts, mcfg.class_num)
        losses.append(loss)
        accs.append(acc)
        recs.append(rec)
        precs.append(prec)

    pending = None  # metric fetch rides behind the next batch's compute
    for batch in prefetch_batches(
            map(trainer.stage_batch, valid_ds.batches(tcfg.batch_size))):
        handle = trainer.eval_on_batch_async(batch)
        if pending is not None:
            consume(pending)
        pending = handle
    if pending is not None:
        consume(pending)
    if not losses:
        return 0.0, 0.0, 0.0, 0.0
    return (float(np.mean(losses)), float(np.mean(accs)),
            float(np.mean(recs)), float(np.mean(precs)))
