from sparsernns_tpu.serve.streaming import StreamingDenoiser

__all__ = ["StreamingDenoiser"]
