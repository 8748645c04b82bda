"""deepsignal_tpu — a TPU-native nanopore methylation-calling framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
bioinfomaticsCSU/deepsignal v0.2.0 (reference layout documented in SURVEY.md):

- ``featurize``   host-side streaming featurizer: tombo-resquiggled fast5
                  signal -> fixed-shape (k-mer, per-base stats, central raw
                  signal) windows (reference: deepsignal/extract_features.py)
- ``models``      BiLSTM-over-kmer + Inception-CNN-over-signal fusion model in
                  flax (reference: deepsignal/model.py, deepsignal/layers.py)
- ``ops``         Pallas TPU kernels for the hot ops (fused LSTM recurrence)
- ``runtime``     pjit/mesh execution: replicated params, data-parallel batch
                  sharding, streaming pipeline, per-read output grouping
                  (reference: deepsignal/call_modifications.py)
- ``train``       sharded Adam training + cross-rank denoise loop
                  (reference: deepsignal/train_model.py, deepsignal/denoise.py)
- ``tools``       site-frequency aggregation, evaluation, dataset utilities
                  (reference: scripts/*.py)
"""

__version__ = "0.1.0"
