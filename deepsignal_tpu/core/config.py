"""Typed configuration for the framework.

The reference drives everything through ~70 argparse flags
(deepsignal/deepsignal.py:131-427); here the same contract is expressed as
dataclasses shared by the CLI, library API, and tests.  Defaults mirror the
reference CLI defaults documented in SURVEY.md §2.6.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class FeatureConfig:
    """Featurizer knobs (deepsignal/deepsignal.py:183-206 defaults)."""

    kmer_len: int = 17
    cent_signals_len: int = 360
    motifs: str = "CG"
    mod_loc: int = 0
    methy_label: int = 1
    normalize_method: str = "mad"      # "mad" | "zscore"
    is_dna: bool = True
    corrected_group: str = "RawGenomeCorrected_000"
    basecall_subgroup: str = "BaseCalled_template"
    # The reference uses python `random.sample` for oversized middle-base
    # signal windows (extract_features.py:166-168) which is nondeterministic.
    # We default to a seeded RNG so extraction is reproducible; set seed=None
    # to mimic the reference's nondeterminism.
    central_sample_seed: Optional[int] = 1234

    def __post_init__(self):
        if self.kmer_len % 2 == 0:
            raise ValueError("kmer_len must be odd")  # extract_features.py:218-219
        if self.normalize_method not in ("mad", "zscore"):
            raise ValueError("normalize_method must be 'mad' or 'zscore'")


@dataclasses.dataclass
class ModelConfig:
    """Model hyperparameters (deepsignal/model.py:19-20, layers.py defaults)."""

    kmer_len: int = 17
    cent_signals_len: int = 360
    class_num: int = 2
    vocab_size: int = 1024
    embedding_size: int = 128
    lstm_hidden: int = 256
    lstm_layers: int = 3
    inception_times: int = 16
    # inception blocks per stage (reference: 3/5/3, layers.py:204-232);
    # reducible for ablations and fast tests
    inception_blocks: tuple = (3, 5, 3)
    is_cnn: bool = True
    is_rnn: bool = True
    is_base: bool = True
    pos_weight: float = 1.0
    # compute dtype for the TPU fast path; params stay float32.
    compute_dtype: str = "float32"     # "float32" | "bfloat16"
    # XLA matmul precision: "highest" = true f32 (TF1 parity), "default" =
    # fastest (bf16-class passes on MXU).  This backend's default is reduced
    # precision, so parity mode must pin "highest".
    matmul_precision: str = "highest"  # "highest" | "high" | "default"
    # LSTM encoder implementation: "xla" = per-layer lax.scan, "pallas" =
    # fused whole-encoder VMEM-resident kernel (ops/pallas/lstm.py),
    # "auto" (default) = pallas on TPU for both dtypes (measured 1.40x f32 /
    # 1.23x bf16 over the scan at batch 16384, scripts/exp_lstm.py).
    lstm_impl: str = "auto"
    # NOTE on the inception branch: a whole-block fused Pallas kernel was
    # built and measured (round 3) — it compiled and matched numerically,
    # but Mosaic's lowering of the shifted 1x3/1x5 convs (rolls = full-tile
    # VPU copies) made it 1.6x SLOWER than XLA's native conv path
    # (22-23 ms vs 13.6 ms per block at [16384, 90, 240] bf16), so it was
    # removed.  XLA's conv fusion is the production path.

    def __post_init__(self):
        if not (self.is_cnn or self.is_rnn):
            # model.py:28-29
            raise ValueError("at least one of is_cnn/is_rnn should be True")


@dataclasses.dataclass
class TrainConfig:
    """Trainer knobs (deepsignal/deepsignal.py:364-384 defaults)."""

    batch_size: int = 512
    learning_rate: float = 0.001
    decay_rate: float = 0.1
    keep_prob: float = 0.5
    max_epoch_num: int = 10
    min_epoch_num: int = 5
    display_step: int = 100
    pos_weight: float = 1.0
    seed: int = 42
    # rolling full-train-state checkpoint at each epoch end (params +
    # optimizer + RNG + shuffle stream; enables exact resume).  The state
    # fetch+serialize is ~0.5 GB for the full model — turn off for
    # throwaway trainings (the best-model checkpointing at display-step
    # boundaries is unaffected).
    save_state: bool = True


@dataclasses.dataclass
class CallConfig:
    """call_mods knobs (deepsignal/deepsignal.py:258-267 defaults)."""

    batch_size: int = 512
    f5_batch_num: int = 50
    nproc: int = 1


@dataclasses.dataclass
class DenoiseConfig:
    """denoise knobs (deepsignal/deepsignal.py:400-418 defaults)."""

    iterations: int = 6
    epoch_num: int = 5
    rounds: int = 5
    score_cf: float = 0.5
    step_interval: int = 100
    batch_size: int = 512
    learning_rate: float = 0.001
    decay_rate: float = 0.1
    keep_prob: float = 0.5
    pos_weight: float = 1.0
    is_cnn: bool = False
    is_base: bool = False
    is_rnn: bool = True
