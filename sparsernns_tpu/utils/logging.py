"""Experiment logging: pluggable metric sinks + model telemetry.

Reference parity: `sparseRNNs/utils/logging.py` (module logger, wandb
init/resume with run-id persistence, eigenvalue stats) plus the per-epoch
telemetry computed in train.py/train_helpers.py (LR extraction, weight /
activation sparsity, gradient norms). wandb is optional; a JSONL sink
works everywhere (multi-host: only process 0 writes).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("sparsernns-tpu")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter(
        "[%(asctime)s %(levelname)s %(name)s] %(message)s"))
    logger.addHandler(_h)
    logger.setLevel(os.environ.get("SPARSERNNS_LOGLEVEL", "INFO"))


def compute_eigenvalue_logs(params: Dict[str, Any]) -> Dict[str, float]:
    """Per-layer Λ statistics (reference logging.py:19-39): magnitude and
    real-part ranges of the continuous-time eigenvalues."""
    out = {}

    def visit(tree, prefix):
        if not isinstance(tree, dict):
            return
        if "Lambda_re" in tree and "Lambda_im" in tree:
            lr = np.asarray(tree["Lambda_re"])
            li = np.asarray(tree["Lambda_im"])
            mag = np.abs(lr + 1j * li)
            out[f"{prefix}eig_mag_max"] = float(mag.max())
            out[f"{prefix}eig_mag_mean"] = float(mag.mean())
            out[f"{prefix}eig_re_max"] = float(lr.max())
            out[f"{prefix}eig_re_min"] = float(lr.min())
        for k, v in tree.items():
            if isinstance(v, dict):
                visit(v, f"{prefix}{k}/")

    visit(params, "")
    return out


def activation_sparsity(intermediates: Dict[str, Any],
                        atol: float = 1e-8) -> Dict[str, float]:
    """Fraction of ~zero activations per captured intermediate
    (reference train_helpers.py:74-75, :783-801)."""
    out = {}
    flat = jax.tree_util.tree_leaves_with_path(intermediates)
    for path, leaf in flat:
        if hasattr(leaf, "shape") and getattr(leaf, "size", 0) > 0:
            key = jax.tree_util.keystr(path)
            out[key] = float(jnp.mean(jnp.isclose(leaf, 0.0, atol=atol)))
    return out


def gradient_norms(grads: Dict[str, Any]) -> Dict[str, float]:
    """Global + per-top-level-branch gradient norms
    (reference train_helpers.py:692-741)."""
    leaves = jax.tree_util.tree_leaves(grads)
    global_sq = sum(float(jnp.sum(g.astype(jnp.float32) ** 2))
                    for g in leaves)
    out = {"grad_norm": float(np.sqrt(global_sq))}
    for key, sub in grads.items():
        sub_leaves = jax.tree_util.tree_leaves(sub)
        if sub_leaves:
            sq = sum(float(jnp.sum(g.astype(jnp.float32) ** 2))
                     for g in sub_leaves)
            out[f"grad_norm/{key}"] = float(np.sqrt(sq))
    return out


class MetricsSink:
    """Base sink interface (reference setup_experiment_logging_fns
    logging.py:42-67)."""

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None):
        raise NotImplementedError

    def log_best(self, metrics: Dict[str, Any]):
        pass

    def finish(self):
        pass

    @property
    def run_id(self) -> Optional[str]:
        return None


class NullSink(MetricsSink):
    def log(self, metrics, step=None):
        pass


class JsonlSink(MetricsSink):
    """Append-only metrics.jsonl; only host 0 writes."""

    def __init__(self, directory: str):
        self._active = jax.process_index() == 0
        self.path = os.path.join(directory, "metrics.jsonl")
        if self._active:
            os.makedirs(directory, exist_ok=True)
        self._best: Dict[str, Any] = {}

    def log(self, metrics, step=None):
        if not self._active:
            return
        rec = {"_time": time.time()}
        if step is not None:
            rec["_step"] = int(step)
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def log_best(self, metrics):
        self._best.update(metrics)
        if self._active:
            with open(self.path.replace("metrics.jsonl", "best.json"),
                      "w") as f:
                json.dump({k: float(v) for k, v in self._best.items()}, f)


class WandbSink(MetricsSink):
    """wandb sink with run-id resume (reference logging.py:42-67).
    Import is deferred and failures degrade to a warning."""

    def __init__(self, project: str, config: Optional[dict] = None,
                 run_id: Optional[str] = None, name: Optional[str] = None):
        self._run = None
        if jax.process_index() != 0:
            return
        try:
            import wandb
            self._run = wandb.init(
                project=project, config=config, id=run_id, name=name,
                resume="must" if run_id else None)
        except Exception as e:  # wandb not installed / offline
            logger.warning("wandb unavailable (%s); metrics not logged", e)

    def log(self, metrics, step=None):
        if self._run is not None:
            self._run.log(metrics, step=step)

    def log_best(self, metrics):
        if self._run is not None:
            for k, v in metrics.items():
                self._run.summary[k] = v

    def finish(self):
        if self._run is not None:
            self._run.finish()

    @property
    def run_id(self):
        return self._run.id if self._run is not None else None


def make_sink(kind: str, directory: str = ".", **kw) -> MetricsSink:
    if kind == "wandb":
        return WandbSink(**kw)
    if kind == "jsonl":
        return JsonlSink(directory)
    return NullSink()
