"""Static-quantization calibration: observers -> frozen scales.

The core of the reference's conversion pipeline (convert.py:867-1033):

1. build the model with ``static_quant=True, calibrating=True`` — every
   FakeQuant runs a MinMaxObserver
2. initialize its variable tree, merge the trained params into it
   (calibration-only leaves like ``scale`` are preserved), and merge the
   trained BatchNorm statistics
3. run forward passes over a calibration set with ``batch_stats`` mutable —
   observers accumulate ranges and derived scales
4. freeze: move scales into params (`move_scales_to_params`) — the result
   loads into the ``calibrating=False`` inference model, and is the input
   to the fxp derivation (`sparsernns_tpu.fxp.derive`).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax

from sparsernns_tpu.quantize.static import (merge_trained_params_into_calibrated,
                                            move_scales_to_params)


def init_calibration_variables(
    cal_model,
    rng,
    example_input,
    trained_params: Dict[str, Any],
    trained_batch_stats: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """Fresh calibration tree with trained weights + BN stats merged in.

    Reference: convert.py:881-929 (fresh cal_state +
    _merge_trained_params_into_calibrated)."""
    variables = cal_model.init(rng, example_input)
    params = merge_trained_params_into_calibrated(
        trained_params, variables["params"])
    batch_stats = variables.get("batch_stats", {})
    if trained_batch_stats:
        batch_stats = merge_trained_params_into_calibrated(
            trained_batch_stats, batch_stats)
    return {"params": params, "batch_stats": batch_stats}


def run_calibration(
    cal_model,
    variables: Dict[str, Any],
    batches: Iterable[Any],
    forward: Optional[Callable] = None,
) -> Dict[str, Any]:
    """Feed calibration batches through the observer-instrumented model.

    ``forward(variables, batch) -> new_batch_stats`` defaults to a plain
    ``apply`` with mutable batch_stats on ``batch`` as the input array.
    Returns the updated variables. Observer min/max reductions are global
    under pjit (SURVEY.md §7 'calibration correctness under sharding').
    """
    if forward is None:
        @jax.jit
        def forward(vs, batch):
            _, mutated = cal_model.apply(vs, batch, mutable=["batch_stats"])
            return mutated["batch_stats"]

    for batch in batches:
        new_stats = forward(variables, batch)
        variables = {"params": variables["params"], "batch_stats": new_stats}
    return variables


def freeze_scales(variables: Dict[str, Any]
                  ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Calibrated variables -> (frozen params, remaining batch_stats).
    Reference: convert.py:969-971."""
    return move_scales_to_params(
        variables["params"], variables.get("batch_stats", {}))


def calibrate(
    cal_model,
    rng,
    example_input,
    trained_params,
    trained_batch_stats,
    batches,
    forward: Optional[Callable] = None,
):
    """One-call pipeline: init + merge -> observe -> freeze.

    Returns (frozen_params, frozen_stats) ready for the
    ``calibrating=False`` static-quant model and for fxp derivation.
    """
    variables = init_calibration_variables(
        cal_model, rng, example_input, trained_params, trained_batch_stats)
    variables = run_calibration(cal_model, variables, batches, forward)
    return freeze_scales(variables)
