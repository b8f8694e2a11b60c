"""sparsernns_tpu — a TPU-native framework for sparse, quantized linear
recurrent (S5-style state-space) networks.

Re-designed from scratch for TPU (JAX / XLA / Pallas / pjit) with the
capabilities of the reference stack (stevenabreu7/SparseRNNs):

- S5 SSM models (HiPPO init, ZOH/bilinear discretization, conj-sym,
  bidirectional, relufication, approx top-k, GLU variants, BN fusion)
- Training engine (optax multi-transform, magnitude-STE pruning, NDNS
  STFT + SI-SNR losses, classification/regression/retrieval heads)
- Quantization: QAT fake-quant ops, static-quant calibration (observers
  -> frozen power-of-2 scales), and a bit-exact fixed-point (fxp)
  inference engine + export/verification tooling
- TPU-first execution: natively batched compute (big MXU matmuls),
  Pallas kernels for the hot scan, and SPMD sharding over a
  (data, model, seq) device mesh via jax.sharding.

Unlike the reference (a single-device research stack that *emulates*
fixed-point arithmetic), the compute path here is written once against a
quantized-ops interface, and precision / sparsity / sharding are
configuration.
"""

__version__ = "0.1.0"
