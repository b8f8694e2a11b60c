"""Static quantization: observers, fake-quant modules, quantized Dense.

Capability parity with the reference static-quant stack
(`sparseRNNs/utils/quantization.py:291-869`): MinMaxObserver,
qparams computation (symmetric/affine, power-of-2 scales), quant-dequant
with STE, FakeQuant / FakeQuantComplex, QuantizedMultiply, QuantizedDense,
and the calibration pytree surgery helpers.

Design differences (TPU-first):
- Modules are natively batched: observers reduce over ALL axes of the
  (B, L, ...) activation directly. Under pjit/NamedSharding the reduction
  is global across the data-parallel mesh axis automatically — the
  reference needed `lax.pmin/pmax` over a vmap axis (quantization.py:342-343)
  for the same semantics. An optional ``axis_name`` supports shard_map use.
- Complex tensors are handled as (re, im) pairs everywhere — matching the
  real-pair compute layout used by the scan kernels.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from sparsernns_tpu.quantize.config import QuantScheme

Array = jax.Array


class MinMaxObserver(nn.Module):
    """Tracks running min/max of activations in the ``batch_stats`` collection.

    Reference semantics: quantization.py:291-349. Per-tensor reduces over all
    axes; per-channel reduces over all but the last axis.
    """

    qscheme: QuantScheme = QuantScheme.per_tensor_symmetric
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        per_channel = self.qscheme in (
            QuantScheme.per_channel_symmetric, QuantScheme.per_channel_affine)
        if per_channel:
            init_shape = (x.shape[-1],)
            reduce_axes = tuple(range(x.ndim - 1))
        else:
            init_shape = ()
            reduce_axes = tuple(range(x.ndim))

        minval = self.variable(
            "batch_stats", "observer_min",
            lambda: jnp.full(init_shape, jnp.inf, dtype=jnp.float32))
        maxval = self.variable(
            "batch_stats", "observer_max",
            lambda: jnp.full(init_shape, -jnp.inf, dtype=jnp.float32))

        local_min = jnp.min(x, axis=reduce_axes)
        local_max = jnp.max(x, axis=reduce_axes)
        if self.axis_name is not None:
            local_min = lax.pmin(local_min, axis_name=self.axis_name)
            local_max = lax.pmax(local_max, axis_name=self.axis_name)

        minval.value = jnp.minimum(minval.value, local_min)
        maxval.value = jnp.maximum(maxval.value, local_max)
        return x


def calculate_qparams(
    minval: Array,
    maxval: Array,
    bits: int,
    qscheme: QuantScheme = QuantScheme.per_tensor_symmetric,
    pow2scale: bool = True,
    eps: float = 1e-6,
) -> Tuple[Array, Array]:
    """min/max -> (scale, zero_point). Reference: quantization.py:352-383."""
    if qscheme in (QuantScheme.per_tensor_symmetric,
                   QuantScheme.per_channel_symmetric):
        max_abs = jnp.maximum(jnp.abs(minval), jnp.abs(maxval))
        quant_max = 2.0 ** (bits - 1) - 1.0
        scale = jnp.maximum(max_abs / quant_max, eps)
        if pow2scale:
            scale = 2.0 ** jnp.round(jnp.log2(scale))
        return scale, jnp.zeros_like(scale)
    elif qscheme == QuantScheme.per_tensor_affine:
        quant_max = 2.0 ** bits - 1.0
        scale = jnp.maximum((maxval - minval) / quant_max, eps)
        if pow2scale:
            scale = 2.0 ** jnp.round(jnp.log2(scale))
        # zero_point in the SIGNED integer range used by quant_dequant
        # (qmin = -2^(b-1)): x_q = round(x/scale) + zp ∈ [qmin, qmax]
        zero_point = jnp.round(-minval / scale) - 2.0 ** (bits - 1)
        return scale, zero_point
    raise NotImplementedError(f"qscheme {qscheme} not implemented")


def quant_dequant(x: Array, scale: Array,
                  zero_point: Union[Array, float], bits: int) -> Array:
    """Quantize-dequantize with straight-through gradients.

    Reference: quantization.py:386-400.
    """
    quant_min = -(2.0 ** (bits - 1))
    quant_max = 2.0 ** (bits - 1) - 1.0
    xq = jnp.clip(jnp.round(x / scale + zero_point), quant_min, quant_max)
    xdq = (xq - zero_point) * scale
    return x + lax.stop_gradient(xdq - x)


class FakeQuant(nn.Module):
    """Observer-calibrated fake quantization of a real tensor.

    calibrating=True: run the observer, keep x unchanged, store the derived
    scale in ``batch_stats``. calibrating=False: apply quant-dequant with
    the frozen scale from ``params`` (moved there by
    :func:`move_scales_to_params`). Reference: quantization.py:403-448.
    """

    bits: int = 8
    pow2scale: bool = True
    qscheme: QuantScheme = QuantScheme.per_tensor_symmetric
    calibrating: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        collection = "batch_stats" if self.calibrating else "params"
        scale_var = self.variable(
            collection, "scale", lambda: jnp.array(1.0, dtype=jnp.float32))

        if self.calibrating:
            observer = MinMaxObserver(
                self.qscheme, axis_name=self.axis_name, name="observer")
            x = observer(x)
            minval = observer.variables["batch_stats"]["observer_min"]
            maxval = observer.variables["batch_stats"]["observer_max"]
            scale, _ = calculate_qparams(
                minval, maxval, self.bits, self.qscheme, self.pow2scale)
            scale_var.value = scale
            return x
        return quant_dequant(x, scale_var.value, 0.0, self.bits)

    def frozen_scale(self) -> Optional[Array]:
        if self.has_variable("params", "scale"):
            return self.get_variable("params", "scale")
        return None

    def calibration_scale(self) -> Optional[Array]:
        """Scale derived from this module's observer stats, if present."""
        if not self.has_variable("batch_stats", "observer"):
            return None
        obs = self.get_variable("batch_stats", "observer")
        scale, _ = calculate_qparams(
            obs["observer_min"], obs["observer_max"],
            self.bits, self.qscheme, self.pow2scale)
        return scale


class FakeQuantComplex(nn.Module):
    """FakeQuant over a complex tensor given as an (re, im) pair.

    Reference: FakeQuantComplex quantization.py:451-474 (which takes
    complex64; here the pair layout is native).
    """

    bits: int = 8
    pow2scale: bool = True
    qscheme: QuantScheme = QuantScheme.per_tensor_symmetric
    calibrating: bool = True
    axis_name: Optional[str] = None

    def setup(self):
        kw = dict(bits=self.bits, pow2scale=self.pow2scale,
                  qscheme=self.qscheme, calibrating=self.calibrating,
                  axis_name=self.axis_name)
        self.quant_real = FakeQuant(**kw)
        self.quant_imag = FakeQuant(**kw)

    def __call__(self, re: Array, im: Array) -> Tuple[Array, Array]:
        return self.quant_real(re), self.quant_imag(im)


class QuantizedMultiply(nn.Module):
    """Static-quant elementwise multiply with observers on both operands.

    Reference: quantization.py:481-533.
    """

    left_bits: int = 8
    right_bits: int = 8
    out_bits: Optional[int] = None
    calibrating: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, a: Array, b: Array) -> Array:
        kw = dict(pow2scale=True, calibrating=self.calibrating,
                  axis_name=self.axis_name)
        a = FakeQuant(bits=self.left_bits, name="quant_left", **kw)(a)
        b = FakeQuant(bits=self.right_bits, name="quant_right", **kw)(b)
        out = a * b
        if self.out_bits is not None:
            out = FakeQuant(bits=self.out_bits, name="quant_out", **kw)(out)
        return out


class QuantizedDense(nn.Module):
    """Dense layer with static input/weight/output quantization.

    Reference: quantization.py:673-816. Weight scales are derived directly
    from the weight tensor (no observer needed); activations use observers
    during calibration and frozen scales afterwards.
    """

    features: int
    a_bits: int = 8
    w_bits: int = 8
    calibrating: bool = True
    use_bias: bool = True
    pow2scale: bool = True
    axis_name: Optional[str] = None
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    bias_init: nn.initializers.Initializer = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features))
        bias = (self.param("bias", self.bias_init, (self.features,))
                if self.use_bias else None)

        kw = dict(pow2scale=self.pow2scale, calibrating=self.calibrating,
                  axis_name=self.axis_name)
        x = FakeQuant(bits=self.a_bits, name="quant_input", **kw)(x)

        if self.w_bits is not None and self.w_bits < 32:
            w_absmax = jnp.max(jnp.abs(lax.stop_gradient(kernel)))
            w_scale, _ = calculate_qparams(
                -w_absmax, w_absmax, self.w_bits, pow2scale=self.pow2scale)
            kernel = quant_dequant(kernel, w_scale, 0.0, self.w_bits)

        y = jnp.matmul(x, kernel, precision=lax.Precision.HIGHEST)
        if bias is not None:
            y = y + bias
        y = FakeQuant(bits=self.a_bits, name="quant_output", **kw)(y)
        return y


# ---------------------------------------------------------------------------
# Calibration pytree surgery
# ---------------------------------------------------------------------------

def merge_trained_params_into_calibrated(trained_params, calibrated_params):
    """Copy trained parameter values into a freshly-initialized calibration
    pytree, preserving any calibration-only leaves (e.g. ``scale``).

    Reference: `_merge_trained_params_into_calibrated` quantization.py:823-842.
    """
    import flax

    flat_trained = flax.traverse_util.flatten_dict(trained_params)
    flat_cal = dict(flax.traverse_util.flatten_dict(calibrated_params))
    for path, leaf in flat_trained.items():
        flat_cal[path] = leaf
    return flax.traverse_util.unflatten_dict(flat_cal)


def move_scales_to_params(params, batch_stats):
    """Move calibrated ``scale`` leaves from batch_stats into params and strip
    observer state, producing the frozen static-quant parameter tree.

    Reference: `_move_scales_to_params` quantization.py:845-869.
    """
    import flax

    flat_params = dict(flax.traverse_util.flatten_dict(params))
    flat_stats = flax.traverse_util.flatten_dict(batch_stats)
    remaining = {}
    for path, leaf in flat_stats.items():
        if path[-1] == "scale":
            flat_params[path] = leaf
        elif "observer" in path:
            continue  # drop observer min/max — only needed during calibration
        else:
            remaining[path] = leaf
    return (flax.traverse_util.unflatten_dict(flat_params),
            flax.traverse_util.unflatten_dict(remaining))
