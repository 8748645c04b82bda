"""Cross-rank training-sample denoising.

Re-design of ``deepsignal/denoise.py:23-345``: iteratively split the training
file into random halves, train a fresh model on each half and score the other
(``rounds`` times per iteration), keep positive samples whose mean predicted
prob_1 exceeds ``score_cf``, re-select negatives matching the positive k-mer
distribution, shuffle-concat into the next iteration's training file; stop
after ``iterations`` or when the kept-ratio exceeds 0.99 (denoise.py:339-340).

Differences from the reference (semantics-preserving):
- halves are trained directly from the TSV (the reference round-trips through
  binary records purely for tf.data speed, denoise.py:23-30)
- training runs on the jitted TPU train step with fixed-shape batches
"""

from __future__ import annotations

import os
import sys
import time
from typing import Optional

import numpy as np

from ..core.config import DenoiseConfig, ModelConfig, TrainConfig
from ..tools.dataset import (concat_two_files, count_line_num,
                             random_select_file_rows_s,
                             select_negsamples_asposkmer)
from .data import TextFeatureDataset, prefetch_batches
from .trainer import Trainer


def train_1time(train_file: str, valid_file: str, valid_lidxs: list,
                model_cfg: ModelConfig, dcfg: DenoiseConfig, mesh=None,
                seed: int = 0) -> dict:
    """Train a fresh model on train_file, score valid_file; returns
    {original_line_idx: prob_1} (denoise.py:33-184).  Training stops early
    when the running train accuracy reaches 0.95 (denoise.py:119-120)."""
    tcfg = TrainConfig(batch_size=dcfg.batch_size,
                       learning_rate=dcfg.learning_rate,
                       decay_rate=dcfg.decay_rate, keep_prob=dcfg.keep_prob,
                       max_epoch_num=dcfg.epoch_num,
                       pos_weight=dcfg.pos_weight, seed=seed)
    trainer = Trainer(model_cfg, tcfg, mesh=mesh)
    train_ds = TextFeatureDataset(train_file)
    shuffle_rng = np.random.default_rng(seed)

    for epoch_id in range(dcfg.epoch_num):
        lr = trainer.epoch_lr(epoch_id)
        accus = []
        iter_id = 0
        start = time.time()
        # metric consumption rides ONE step behind the dispatch (same
        # pattern as trainer.train(): the d2h fetch of step i's loss/preds
        # overlaps step i+1's compute instead of costing a link round trip
        # per step); values and their step attribution are unchanged
        pending = None  # (iter_id, labels, handle)

        def consume(iid, labels, handle):
            nonlocal start
            loss, _counts, preds, valid = trainer.resolve_metrics(handle)
            if iid % dcfg.step_interval == 0:
                labels = np.asarray(labels)
                accu = float(np.mean(labels[:valid] == preds))
                accus.append(accu)
                print("Epoch [{}/{}], Step {}, Loss: {:.4f}, Accuracy: "
                      "{:.4f}, Time: {:.2f}s".format(
                          epoch_id + 1, dcfg.epoch_num, iid, loss, accu,
                          time.time() - start))
                sys.stdout.flush()
                start = time.time()

        for staged in prefetch_batches(
                map(lambda b: (b["labels"], trainer.stage_batch(b)),
                    train_ds.batches(tcfg.batch_size,
                                     shuffle_rng=shuffle_rng))):
            labels, batch = staged
            handle = trainer.train_on_batch_async(batch, lr)
            iter_id += 1
            if pending is not None:
                consume(*pending)
            pending = (iter_id, labels, handle)
        if pending is not None:
            consume(*pending)
        if accus and np.mean(accus) >= 0.95:
            break

    # validation pass: per-line prob_1, order-preserving; prob fetches ride
    # one batch behind the dispatch (see Trainer.eval_on_batch_async)
    valid_ds = TextFeatureDataset(valid_file)
    idx2prob: dict = {}
    cnt = 0

    def consume(handle):
        nonlocal cnt
        _loss, _counts, _preds, probs1, valid = trainer.resolve_eval(handle)
        for p in probs1[:valid]:
            idx2prob[valid_lidxs[cnt]] = float(p)
            cnt += 1

    pending = None
    for batch in prefetch_batches(
            map(trainer.stage_batch, valid_ds.batches(dcfg.batch_size))):
        handle = trainer.eval_on_batch_async(batch)
        if pending is not None:
            consume(pending)
        pending = handle
    if pending is not None:
        consume(pending)
    return idx2prob


def train_rounds(train_file: str, iterstr: str, model_cfg: ModelConfig,
                 dcfg: DenoiseConfig, mesh=None, seed: int = 0) -> dict:
    """One denoise iteration of cross-rank rounds (denoise.py:187-220)."""
    print("\n##########Train Cross Rank##########")
    total_num = count_line_num(train_file, False)
    half_num = total_num // 2
    fname, fext = os.path.splitext(train_file)
    idx2probs_all: dict = {i: [] for i in range(total_num)}

    for i in range(dcfg.rounds):
        print("##########Train Cross Rank, Iter {}, Round {}##########"
              .format(iterstr, i + 1))
        f1 = fname + ".half1" + fext
        f2 = fname + ".half2" + fext
        lidxs1, lidxs2 = random_select_file_rows_s(train_file, f1, f2,
                                                   half_num, False)
        probs2 = train_1time(f1, f2, lidxs2, model_cfg, dcfg, mesh,
                             seed=seed + 2 * i)
        probs1 = train_1time(f2, f1, lidxs1, model_cfg, dcfg, mesh,
                             seed=seed + 2 * i + 1)
        for idx, p in probs2.items():
            idx2probs_all[idx].append(p)
        for idx, p in probs1.items():
            idx2probs_all[idx].append(p)
        os.remove(f1)
        os.remove(f2)
    print("##########Train Cross Rank, finished!##########")
    sys.stdout.flush()
    return idx2probs_all


def clean_samples(train_file: str, idx2probs: dict,
                  score_cf: float = 0.5):
    """Keep positives with mean prob_1 > score_cf (denoise.py:223-287).
    Returns (clean_pos_file, left_ratio)."""
    print("\n######clean the samples######")
    idx2mean = {idx: (float(np.mean(ps)) if ps else 0.0)
                for idx, ps in idx2probs.items()}
    pos_total = 0
    pos_hc = set()
    with open(train_file, "r") as rf:
        for i, line in enumerate(rf):
            label = int(line.rstrip("\n").rsplit("\t", 1)[1])
            if label == 1:
                pos_total += 1
                if idx2mean.get(i, 0.0) > score_cf:
                    pos_hc.add(i)
    left_ratio = float(len(pos_hc)) / pos_total if pos_total else 0.0
    print("{} ({}) high quality positive samples left, 0 high quality "
          "negative samples left".format(len(pos_hc), left_ratio))

    fname, fext = os.path.splitext(train_file)
    clean_pos = fname + ".pos.cf" + str(score_cf) + fext
    with open(train_file, "r") as rf, open(clean_pos, "w") as wf:
        for i, line in enumerate(rf):
            if i in pos_hc:
                wf.write(line)
    print("######clean the samples, finished!######")
    sys.stdout.flush()
    return clean_pos, left_ratio


def _all_negative_samples(train_file: str) -> str:
    fname, fext = os.path.splitext(train_file)
    neg_file = fname + ".neg_all" + fext
    with open(train_file) as rf, open(neg_file, "w") as wf:
        for line in rf:
            if int(line.rstrip("\n").rsplit("\t", 1)[1]) == 0:
                wf.write(line)
    return neg_file


def denoise(train_file: str, model_cfg: Optional[ModelConfig] = None,
            dcfg: Optional[DenoiseConfig] = None, mesh=None,
            seed: int = 0) -> str:
    """Full denoise driver (denoise.py:305-345); returns the final denoised
    training-file path."""
    total_start = time.time()
    dcfg = dcfg or DenoiseConfig()
    if model_cfg is None:
        model_cfg = ModelConfig(is_cnn=dcfg.is_cnn, is_rnn=dcfg.is_rnn,
                                is_base=dcfg.is_base,
                                pos_weight=dcfg.pos_weight)
    ori_train_file = train_file
    train_neg_file = _all_negative_samples(train_file)

    for iter_c in range(dcfg.iterations):
        print("\n###### cross rank to clean samples, Iter: {} ######"
              .format(iter_c + 1))
        idx2probs = train_rounds(train_file, str(iter_c + 1), model_cfg,
                                 dcfg, mesh, seed=seed + 100 * iter_c)
        clean_pos, left_ratio = clean_samples(train_file, idx2probs,
                                              dcfg.score_cf)
        if train_file != ori_train_file:
            os.remove(train_file)

        print("\n#####concat denoised file#####")
        pos_num = count_line_num(clean_pos)
        fname, fext = os.path.splitext(train_neg_file)
        seled_neg = fname + ".r" + str(pos_num) + fext
        select_negsamples_asposkmer(clean_pos, train_neg_file, seled_neg)

        fname, fext = os.path.splitext(ori_train_file)
        train_file = fname + ".denoise" + str(iter_c + 1) + fext
        concat_two_files(clean_pos, seled_neg, concated_fp=train_file)
        os.remove(seled_neg)
        os.remove(clean_pos)
        print("#####concat denoised file, finished!#####")

        if left_ratio > 0.99:
            break

    os.remove(train_neg_file)
    print("###### denoised file for training: {}".format(train_file))
    print("###### denoise totally costs {:.2f} seconds"
          .format(time.time() - total_start))
    return train_file
