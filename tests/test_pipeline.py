"""Full-pipeline orchestration tests: train -> checkpoint/resume ->
convert (calibrate + static-quant validate) -> fxp inference/verify/export
— the reference's main.py/convert.py/fxprun.py flows end to end on tiny
synthetic data."""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# end-to-end / multi-process / compile-heavy module: excluded from the
# fast local path (`pytest -m "not slow"`) — VERDICT r4 #9
pytestmark = pytest.mark.slow


from sparsernns_tpu.utils.config import RunConfig


def smoke_cfg(tmp_path, **kw):
    base = dict(
        dataset="ndns", synthetic_data=True, synthetic_size=4,
        synthetic_seconds=0.5, n_layers=2, d_model=12, ssm_size_base=16,
        blocks=2, glu_variant="half1", clip_eigs=True, prenorm=True,
        batchnorm=True, bsz=2, epochs=2, opt_config="noBCdecay",
        logger="jsonl", checkpoint_dir=str(tmp_path / "run"),
        relufication=True, p_dropout=0.0, jax_seed=0,
        convert_quantization="w8a16")
    base.update(kw)
    return RunConfig(**base)


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    from sparsernns_tpu.train.loop import train
    tmp = tmp_path_factory.mktemp("pipeline")
    cfg = smoke_cfg(tmp)
    out = train(cfg)
    return cfg, out


def test_train_produces_metrics_and_checkpoint(trained_run):
    cfg, out = trained_run
    assert out["metadata"]["best_val_loss"] < float("inf")
    metrics_path = os.path.join(cfg.checkpoint_dir, "metrics.jsonl")
    assert os.path.exists(metrics_path)
    lines = [json.loads(l) for l in open(metrics_path)]
    assert any("train_loss" in l for l in lines)
    assert any(k.startswith("val_") for l in lines for k in l)
    # eigenvalue telemetry present
    assert any("eig_mag_max" in k for l in lines for k in l)


def test_train_resumes_from_checkpoint(trained_run):
    from sparsernns_tpu.train.loop import train
    cfg, out = trained_run
    cfg2 = dataclasses.replace(cfg, epochs=3)
    out2 = train(cfg2)  # restores epoch 2, runs one more
    assert out2["metadata"]["next_epoch"] == 3


@pytest.fixture(scope="module")
def converted_run(trained_run):
    from sparsernns_tpu.quantize.convert import convert
    cfg, _ = trained_run
    cfg = dataclasses.replace(
        cfg, validate_baseline=True, store_activations=True,
        validate_naive_scan=True, validate_aqt=True,
        calibrate_quant=True, validate_static_quant=True,
        train_static_quant=True, qaft_epochs=1)
    results = convert(cfg)
    return cfg, results


def test_convert_stages(converted_run):
    cfg, results = converted_run
    for stage in ("baseline", "naive_scan", "qat", "static_quant"):
        assert stage in results, results.keys()
        assert np.isfinite(results[stage]["loss"])
    # associative vs sequential scan: same numerics
    assert abs(results["baseline"]["loss"]
               - results["naive_scan"]["loss"]) < 0.05
    # North-star gate (BASELINE.md "SI-SNR Δ vs fp32"): static-quant
    # w8a16 must stay within 1 dB of the fp32 baseline (reference
    # validate_static_quant stage, convert.py:998-1033)
    assert abs(results["static_quant"]["si_snr"]
               - results["baseline"]["si_snr"]) < 1.0
    assert os.path.exists(os.path.join(cfg.checkpoint_dir,
                                       "val_metrics.json"))


def test_fxp_inference_and_export(converted_run):
    from sparsernns_tpu.fxp import runner
    cfg, results = converted_run
    metrics = runner.run_inference(cfg)
    assert np.isfinite(metrics["Val Loss - fxp"])
    # SI-SNR gates: integer engine within 1.5 dB of fp32 and within
    # 0.5 dB of the static-quant emulation it implements bit-near
    # (BASELINE.md north star; replaces the old +/-30-loss budget)
    assert abs(metrics["Val Acc - fxp"]
               - results["baseline"]["si_snr"]) < 1.5
    assert abs(metrics["Val Acc - fxp"]
               - results["static_quant"]["si_snr"]) < 0.5

    path = runner.export_bundle(cfg)
    assert os.path.exists(os.path.join(path, "weights.npz"))
    manifest = json.load(open(os.path.join(path, "manifest.json")))
    assert manifest["format_version"] == 1
    weights = np.load(os.path.join(path, "weights.npz"))
    assert any("ssm" in k for k in weights.files)


def test_fxp_verification_report(converted_run):
    from sparsernns_tpu.fxp import runner
    cfg, _ = converted_run
    summary = runner.run_verification(cfg)
    assert summary["matched_blocks"] > 0
    report = os.path.join(cfg.checkpoint_dir, "verification", "README.md")
    assert os.path.exists(report)
    content = open(report).read()
    assert "rel_mean" in content


def test_cli_parser_and_recipe(tmp_path):
    from sparsernns_tpu.cli import build_parser
    from sparsernns_tpu.utils.config import config_from_args
    parser = build_parser()
    args = parser.parse_args(
        ["train", "--recipe", "recipes/ndns.json", "--bsz", "4"])
    cfg = config_from_args(args).with_recipe(args.recipe)
    assert cfg.d_model == 192 and cfg.blocks == 16
    assert cfg.opt_config == "noBCdecay"
    # recipe overlay wins over flags (reference main.py:471-478 semantics)
    assert cfg.bsz == 32

    with pytest.raises(ValueError):
        bad = tmp_path / "bad.json"
        bad.write_text('{"nonexistent_flag": 1}')
        cfg.with_recipe(str(bad))


def test_dim_scale():
    cfg = RunConfig(d_model=192, ssm_size_base=256, blocks=16,
                    dim_scale=0.5)
    scaled = cfg.apply_dim_scale()
    assert scaled.d_model == 96
    assert scaled.ssm_size_base % (2 * scaled.blocks) == 0


def test_classification_training_loop(tmp_path):
    from sparsernns_tpu.train.loop import train
    cfg = RunConfig(
        dataset="synthetic-classification", synthetic_size=16,
        n_layers=1, d_model=12, ssm_size_base=16, blocks=2, bsz=4,
        epochs=2, opt_config="standard", logger="jsonl",
        checkpoint_dir=str(tmp_path / "cls"), p_dropout=0.0, jax_seed=0)
    out = train(cfg)
    assert out["metadata"]["best_val_loss"] < float("inf")
    assert 0.0 <= out["metadata"]["best_si_snr"] <= 1.0  # accuracy slot


def test_convert_qaft_stage(converted_run):
    """QAFT with frozen scales runs (requires the optimizer state to be
    rebuilt over the frozen tree with its extra scale leaves)."""
    cfg, results = converted_run
    assert "qaft_static" in results
    hist = results["qaft_static"]["history"]
    assert len(hist) == 1 and np.isfinite(hist[0]["train_loss"])


def test_convert_engine_stage(converted_run):
    cfg, results = converted_run
    assert "engine" in results
    assert np.isfinite(results["engine"]["loss"])
    # serving engine: within 1 dB SI-SNR of fp32 and 0.5 dB of the
    # static-quant emulation (north-star gates, BASELINE.md)
    assert abs(results["engine"]["si_snr"]
               - results["baseline"]["si_snr"]) < 1.0
    assert abs(results["engine"]["si_snr"]
               - results["static_quant"]["si_snr"]) < 0.5


def test_best_checkpoint_survives_retention(tmp_path):
    """Latest-N retention must never lose the BEST epoch: the train loop
    mirrors improvements into a single-slot <dir>/best manager and
    convert() restores from it when the main stack has GC'd the epoch
    (reference protocol: convert.py:278-283 converts the best-val
    checkpoint). Regression: the round-3 quality sweep converted seed 2
    at the last epoch, 1.1 dB below its best."""
    from sparsernns_tpu.train.checkpoint import CheckpointManager
    from sparsernns_tpu.train.loop import train

    cfg = smoke_cfg(tmp_path, epochs=6)
    out = train(cfg)
    best_epoch = out["metadata"]["best_epoch"]
    best_dir = os.path.join(cfg.checkpoint_dir, "best")
    assert os.path.isdir(best_dir)
    bm = CheckpointManager(best_dir)
    assert bm.latest_step() == best_epoch
    bm.close()
    # main stack keeps only the last 3 — when the best epoch is older
    # than that, only the best/ slot still has it
    mm = CheckpointManager(cfg.checkpoint_dir)
    retained = set(mm.all_steps())
    mm.close()
    assert len(retained) <= 3

    from sparsernns_tpu.quantize.convert import convert
    results = convert(dataclasses.replace(
        cfg, validate_baseline=True, calibrate_quant=False,
        validate_static_quant=False, validate_engine=False))
    assert "baseline" in results
