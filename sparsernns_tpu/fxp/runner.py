"""Fxp inference / verification / export driver.

Reference parity: `sparseRNNs/fxprun.py` (run_inference = NDNS validation
of the integer model; run_verification = layer-by-layer comparison of fxp
intermediates vs stored float activations via the Reporter; --export =
self-describing integer bundle).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sparsernns_tpu.fxp.derive import FxpModelConfig, build_fxp_model
from sparsernns_tpu.fxp.reporter import Reporter
from sparsernns_tpu.quantize.config import quantization_recipes
from sparsernns_tpu.train.checkpoint import ArtifactStore
from sparsernns_tpu.train.loop import build_dataset, prep_ndns_batch
from sparsernns_tpu.utils.config import RunConfig
from sparsernns_tpu.utils.logging import logger


def load_fxp_model(cfg: RunConfig, **cfg_overrides):
    """Frozen conversion artifacts -> integer model."""
    store = ArtifactStore(os.path.join(cfg.checkpoint_dir or ".",
                                       "conversion"))
    frozen_params = store.load("frozen_params")
    frozen_stats = store.load("frozen_stats")
    q_config = quantization_recipes[cfg.convert_quantization](
        static_quant=True, calibrating=False)
    model_cfg = FxpModelConfig.infer(
        frozen_params, glu_variant=cfg.glu_variant,
        relufication=cfg.relufication, prenorm=cfg.prenorm,
        clip_eigs=cfg.clip_eigs, conj_sym=cfg.conj_sym,
        discretization=cfg.discretization,
        fuse_batchnorm_linear=cfg.fuse_batchnorm_linear,
        topk=cfg.topk, approx_topk=cfg.approx_topk)
    return build_fxp_model(frozen_params, frozen_stats, q_config,
                           model_cfg=model_cfg), frozen_params, frozen_stats


def run_inference(cfg: RunConfig) -> Dict[str, float]:
    """NDNS validation of the integer model (reference fxprun.py:25-95,
    :466-514). Emits 'Val Loss - fxp' / 'Val Acc - fxp' (mean SI-SNR)."""
    fxp_model, _, _ = load_fxp_model(cfg)
    _, valloader, _, _, _, _, _ = build_dataset(cfg)

    from sparsernns_tpu.train.losses import (STFT_MAG_MEAN,
                                             ndns_loss_from_mask)
    losses, snrs = [], []
    t0 = time.perf_counter()
    for noisy, clean in valloader:
        noisy = jnp.asarray(noisy)
        clean = jnp.asarray(clean)
        noisy_mag, noisy_phase, clean_mag = prep_ndns_batch(noisy, clean)
        x = jnp.transpose(noisy_mag - STFT_MAG_MEAN, (0, 2, 1))
        mask = fxp_model(x).to_float()
        mask = jnp.transpose(mask, (0, 2, 1))
        loss, snr, _ = ndns_loss_from_mask(
            mask, noisy_mag, noisy_phase, clean_mag, clean)
        losses.append(float(loss))
        snrs.append(float(snr))
    wall = time.perf_counter() - t0
    metrics = {"Val Loss - fxp": float(np.mean(losses)),
               "Val Acc - fxp": float(np.mean(snrs)),
               "fxp_forward_seconds": wall}
    logger.info("fxp inference: %s", metrics)
    out_path = os.path.join(cfg.checkpoint_dir or ".",
                            "fxp_val_metrics.json")
    with open(out_path, "w") as f:
        json.dump(metrics, f, indent=2)
    return metrics


def run_verification(cfg: RunConfig,
                     output_dir: Optional[str] = None) -> Dict[str, Any]:
    """Replay the fxp model on the stored golden inputs and diff every
    captured block against the float activations (reference
    fxprun.py:517-733)."""
    fxp_model, _, _ = load_fxp_model(cfg)
    store = ArtifactStore(os.path.join(cfg.checkpoint_dir or ".",
                                       "conversion"))
    golden = store.load("activations")
    inputs = store.load("activation_inputs")

    fxp_model.set_store_intermediates(True)
    fxp_model(jnp.asarray(inputs["x"]))
    fxp_inter = {}
    for name, val in fxp_model.collect_intermediates().items():
        if isinstance(val, tuple) and len(val) == 2:  # complex -> re/im
            fxp_inter[f"{name}.re"] = np.asarray(val[0])
            fxp_inter[f"{name}.im"] = np.asarray(val[1])
        else:
            fxp_inter[name] = np.asarray(val)

    reporter = Reporter(output_dir or os.path.join(
        cfg.checkpoint_dir or ".", "verification"))

    golden_flat = _flatten(golden)
    matched = 0
    for fxp_name, fxp_val in fxp_inter.items():
        shape = (fxp_val[0].shape if isinstance(fxp_val, tuple)
                 else np.asarray(fxp_val).shape)
        gold = _match_block(fxp_name, golden_flat, shape)
        if gold is None:
            continue
        reporter.add_block(fxp_name, gold, fxp_val)
        matched += 1
    path = reporter.write()
    summary = reporter.summary()
    summary["matched_blocks"] = matched
    logger.info("verification: %s -> %s", summary, path)
    return summary


def _flatten(tree, prefix="") -> Dict[str, Any]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}."))
    elif isinstance(tree, (tuple, list)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}."))
    else:
        out[prefix.rstrip(".")] = tree
    return out


# fxp intermediate suffix -> (flax golden-name fragments, required ending)
_BLOCK_MAP = {
    "encoder.encoder.output": (("encoder_output",), None),
    "ssm.states.re": (("pre_C",), "0.0"),
    "ssm.states.im": (("pre_C",), "0.1"),
    "ssm.input": (("pre_s5",), None),
    "pre_GLU": (("pre_GLU",), None),
}


def _match_block(fxp_name: str, golden_flat: Dict[str, Any],
                 shape) -> Optional[Any]:
    """Heuristic name alignment between the fxp module tree and the flax
    sown intermediates (e.g. 'encoder.layers_0.ssm.states' <->
    '...layers_0...pre_C'), gated on identical shapes."""
    import re
    m = re.search(r"layers_(\d+)", fxp_name)
    layer = m.group(0) if m else None
    for suffix, (gold_frags, ending) in _BLOCK_MAP.items():
        if not fxp_name.endswith(suffix):
            continue
        for gname, gval in golden_flat.items():
            if not all(f in gname for f in gold_frags):
                continue
            if ending is not None and not gname.endswith(ending):
                continue
            if layer is not None and layer not in gname:
                continue
            if layer is None and "layers_" in gname:
                continue
            if np.asarray(gval).shape == tuple(shape):
                return gval
    return None


def export_bundle(cfg: RunConfig, path: Optional[str] = None) -> str:
    """Write the self-describing integer export (int weights + formats) as
    an .npz + manifest (replaces fxpmodel.pkl, fxprun.py:476-495)."""
    fxp_model, _, _ = load_fxp_model(cfg)
    bundle = fxp_model.export()
    path = path or os.path.join(cfg.checkpoint_dir or ".",
                                "fxp_export")
    os.makedirs(path, exist_ok=True)

    arrays: Dict[str, np.ndarray] = {}
    manifest: Dict[str, Any] = {"format_version": 1}

    def walk(node, prefix):
        if isinstance(node, dict):
            if "data" in node and isinstance(node["data"], np.ndarray):
                arrays[prefix] = node["data"]
                return {k: v for k, v in node.items() if k != "data"} | {
                    "array": prefix}
            return {k: walk(v, f"{prefix}.{k}" if prefix else k)
                    for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, f"{prefix}.{i}") for i, v in enumerate(node)]
        return node

    manifest["model"] = walk(bundle, "")
    np.savez_compressed(os.path.join(path, "weights.npz"), **arrays)
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, default=str)
    logger.info("exported %d integer tensors to %s", len(arrays), path)
    return path
