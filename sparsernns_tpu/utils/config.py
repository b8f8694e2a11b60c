"""Run configuration: the framework's flag schema + JSON recipe overlay.

Reference parity: main.py:16-491 (argparse schema, recipe merge at
main.py:471-478, dim_scale rescale at main.py:480-485) and
fxprun.py:98-269. One dataclass is the single source of truth; the CLI is
generated from it and JSON recipes overlay onto it.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from typing import Optional


@dataclasses.dataclass
class RunConfig:
    # --- experiment / logging (main.py wandb+ckpt flags) ---
    run_name: Optional[str] = None
    logger: str = "jsonl"               # jsonl | wandb | none
    wandb_project: str = "sparsernns-tpu"
    checkpoint_dir: Optional[str] = None
    restore_checkpoint: bool = True
    reset_optimizer: bool = False
    log_act_sparsity: str = "none"      # none | val | train | both
    grad_norm_warn_threshold: float = 50.0  # epoch-mean grad-norm warning
    profile: bool = False
    profile_dir: str = "/tmp/sparsernns_profile"

    # --- dataset ---
    dataset: str = "ndns"
    dir_name: Optional[str] = None
    bsz: int = 32
    #: gradient-accumulation microbatch SIZE (None = full-batch step).
    #: Measured on v5e (PERF.md round-4): bsz=32 with microbatch=8 runs
    #: the train step 37% faster than the full-batch step at identical
    #: gradients (exact mean; BN stats EMA per-chunk).
    microbatch: Optional[int] = None
    synthetic_data: bool = False
    synthetic_size: int = 64
    synthetic_seconds: float = 30.0

    # --- model ---
    n_layers: int = 3
    d_model: int = 192
    ssm_size_base: int = 256
    blocks: int = 16
    C_init: str = "lecun_normal"
    discretization: str = "zoh"
    mode: str = "pool"
    activation_fn: str = "half_glu1"
    conj_sym: bool = True
    clip_eigs: bool = True
    bidirectional: bool = False
    dt_min: float = 0.001
    dt_max: float = 0.1
    prenorm: bool = True
    batchnorm: bool = True
    bn_momentum: float = 0.95
    batchnorm_use_bias: bool = True
    batchnorm_use_scale: bool = True
    glu_variant: str = "half1"
    fuse_batchnorm_linear: bool = False
    dim_scale: float = 1.0
    scan_mode: str = "associative"      # associative|sequential|pallas|fused|blocked
    # Pallas kernels' time-block size. None (default) consults the
    # persisted autotune cache (runs/autotune.json, seeded with the
    # round-4 v5e measurements; re-measure with
    # `python -m sparsernns_tpu.utils.autotune --persist`) and falls
    # back to each kernel's hand-set default — VERDICT r4 #5.
    block_t: Optional[int] = None
    # residual-stream storage dtype on the padded-stream training fast
    # path ("bfloat16" halves the whole-layer kernels' stream HBM;
    # params/grads/BN stats stay f32) — opt-in, see PERF.md
    train_stream_dtype: str = "float32"

    # --- regularization / optimization ---
    p_dropout: float = 0.1
    jax_seed: int = 1919
    # dataset seed override (None = jax_seed). Separates the DATA draw
    # from model-init/dropout randomness — without it, multi-seed
    # quality sweeps confound "hard synthetic val draw" with "bad
    # training trajectory" (the seed-2 investigation, tools/seed2_diag)
    data_seed: Optional[int] = None
    epochs: int = 50
    warmup_end: int = 1
    early_stop_patience: int = 1000
    lr_factor: float = 4.0
    ssm_lr_base: float = 1e-3
    weight_decay: float = 0.04
    opt_config: str = "noBCdecay"
    dt_global: bool = False
    grad_clip_threshold: Optional[float] = None
    lr_min: float = 1e-6
    # LR schedule: "cosine" (warmup-cosine, the default) or "plateau"
    # (constant LR decayed on val-quality plateaus — reference
    # train_helpers.py:100-148 wired via reduce_lr_on_plateau)
    lr_schedule: str = "cosine"
    plateau_factor: float = 0.2
    plateau_patience: int = 20

    # --- sparsity ---
    pruning: str = "no_prune"
    relufication: bool = False
    topk: float = 1.0
    approx_topk: bool = False

    # --- quantization ---
    quantization: str = "none"
    quant_input: Optional[float] = None
    # fused-kernel activation-QAT with per-TENSOR scales via a two-pass
    # global absmax (ssm.qat_global_scales); default = per-block scales
    qat_global_scales: bool = False

    # --- convert pipeline stage gates (reference convert flags) ---
    convert_quantization: str = "w8a16"
    validate_baseline: bool = False
    store_activations: bool = False
    validate_naive_scan: bool = False
    validate_aqt: bool = False
    train_aqt: bool = False
    calibrate_quant: bool = True
    validate_static_quant: bool = True
    validate_engine: bool = True
    # serving engine: run every w8a16/w8a8 dot on the MXU int8 path via
    # the exact two-plane code decomposition (ops/intdot.py) with the
    # static path's full requant chain applied in-kernel
    engine_mxu16: bool = False
    # serving engine route: "auto" (fused Pallas kernels when eligible)
    # or "xla" (pure dot_general/elementwise program — blocked matmul
    # scan, dequantized float dots; for conformance-limited transports
    # and portability/debugging)
    engine_route: str = "auto"
    train_static_quant: bool = False
    qaft_epochs: int = 10

    # --- parallelism (greenfield; no reference equivalent) ---
    mesh_data: int = -1
    mesh_model: int = 1
    mesh_seq: int = 1

    @property
    def lr(self) -> float:
        return self.lr_factor * self.ssm_lr_base

    def apply_dim_scale(self) -> "RunConfig":
        """Uniform model rescale (reference main.py:480-485)."""
        if self.dim_scale == 1.0:
            return self
        s = self.dim_scale
        return dataclasses.replace(
            self,
            d_model=int(self.d_model * s),
            ssm_size_base=max(self.blocks,
                              int(self.ssm_size_base * s) // (2 * self.blocks)
                              * 2 * self.blocks),
            dim_scale=1.0,
        )

    def with_recipe(self, path: str) -> "RunConfig":
        """Overlay a JSON recipe (reference main.py:471-478)."""
        with open(path) as f:
            recipe = json.load(f)
        known = {f.name for f in dataclasses.fields(self)}
        unknown = set(recipe) - known
        if unknown:
            raise ValueError(f"unknown recipe keys: {sorted(unknown)}")
        return dataclasses.replace(self, **recipe)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


def _optional_type(annotation) -> type:
    """Element type for Optional[...] annotations (stringified under
    `from __future__ import annotations` or plain)."""
    text = str(annotation)
    if "float" in text:
        return float
    if "int" in text:
        return int
    return str


def add_config_args(parser: argparse.ArgumentParser):
    """Generate CLI flags from the dataclass fields."""
    for f in dataclasses.fields(RunConfig):
        name = f"--{f.name}"
        if f.type in ("bool", bool) or isinstance(f.default, bool):
            parser.add_argument(name, type=lambda s: s.lower() in
                                ("1", "true", "yes"), default=f.default)
        elif f.default is None:
            # Optional fields still need their element type — otherwise
            # "--grad_clip_threshold 0.5" arrives as the string "0.5"
            parser.add_argument(name, type=_optional_type(f.type),
                                default=None)
        else:
            parser.add_argument(name, type=type(f.default),
                                default=f.default)


def config_from_args(args: argparse.Namespace) -> RunConfig:
    known = {f.name for f in dataclasses.fields(RunConfig)}
    kw = {k: v for k, v in vars(args).items() if k in known}
    return RunConfig(**kw)
