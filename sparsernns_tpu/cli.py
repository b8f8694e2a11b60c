"""Command-line entry point.

Reference parity: main.py (dispatch --train / --convert with recipe
overlay and dim_scale) plus fxprun.py's standalone entry, unified:

    python -m sparsernns_tpu.cli train   --recipe recipes/ndns.json ...
    python -m sparsernns_tpu.cli convert --checkpoint_dir runs/x ...
    python -m sparsernns_tpu.cli fxp     --checkpoint_dir runs/x --fxp_mode inference|verify|export
"""

from __future__ import annotations

import argparse
import sys

from sparsernns_tpu.utils.config import (RunConfig, add_config_args,
                                         config_from_args)
from sparsernns_tpu.utils.logging import logger


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser("sparsernns_tpu")
    parser.add_argument("command",
                        choices=["train", "convert", "fxp"],
                        help="pipeline stage to run")
    parser.add_argument("--recipe", default=None,
                        help="JSON recipe overlay (see recipes/)")
    parser.add_argument("--fxp_mode", default="inference",
                        choices=["inference", "verify", "export"])
    add_config_args(parser)
    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)
    if args.recipe:
        cfg = cfg.with_recipe(args.recipe)
    cfg = cfg.apply_dim_scale()
    logger.info("command=%s config=%s", args.command, cfg)

    if args.command == "train":
        from sparsernns_tpu.parallel.mesh import maybe_initialize_distributed
        from sparsernns_tpu.train.loop import train
        maybe_initialize_distributed()
        train(cfg)
    elif args.command == "convert":
        from sparsernns_tpu.quantize.convert import convert
        results = convert(cfg)
        logger.info("conversion results: %s", results)
    elif args.command == "fxp":
        from sparsernns_tpu.fxp import runner
        if args.fxp_mode == "inference":
            runner.run_inference(cfg)
        elif args.fxp_mode == "verify":
            runner.run_verification(cfg)
        else:
            runner.export_bundle(cfg)
    return 0


if __name__ == "__main__":
    sys.exit(main())
