from sparsernns_tpu.quantize.config import (QuantizationConfig, QuantScheme,
                                            quantization_recipes)
from sparsernns_tpu.quantize.qat import (QuantizedOps, fake_quant, q_dot,
                                         q_had)

__all__ = [
    "QuantizationConfig",
    "QuantScheme",
    "quantization_recipes",
    "QuantizedOps",
    "fake_quant",
    "q_dot",
    "q_had",
]
