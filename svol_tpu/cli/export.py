"""Export a trained checkpoint as a self-contained serving artifact.

    python -m svol_tpu.cli.export --resume save/best --export_dir save/export \
        --export_bs 8 [--export_pixels uint8|float32] [--export_platforms tpu,cpu] \
        <the usual model/data flags>

Produces one directory (StableHLO module with embedded weights + meta.json)
that `svol_tpu.serving.load_exported` turns back into a predict callable on
any machine with jaxlib — no model code, config, or checkpoint needed at
serving time (svol_tpu/serving.py). With ``--quantize int8
--calibration_batches N`` the calibrated static scales are baked in too, so
the artifact ships the fastest measured serving configuration
(PERFORMANCE.md).
"""
from __future__ import annotations

import argparse

from svol_tpu.config import config_from_args
from svol_tpu.serving import export_model
from svol_tpu.utils import cur_time, setup_logger


def main(argv=None) -> None:
    from svol_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--export_dir", required=True)
    ap.add_argument("--export_bs", type=int, default=8)
    ap.add_argument("--export_pixels", default="uint8",
                    choices=["uint8", "float32"])
    ap.add_argument("--export_platforms", default=None,
                    help="comma list, e.g. tpu,cpu (default: current backend)")
    own, rest = ap.parse_known_args(argv)
    config = config_from_args(rest)
    logger = setup_logger("SVOL_export", config.train.log_dir,
                          filename=cur_time() + "_export.txt")

    from svol_tpu.cli.infer import eval_setup

    model, _criterion, state = eval_setup(config)
    if not config.train.resume:
        logger.warning("no --resume checkpoint given; exporting random init")

    extra_variables = None
    if config.model.quantize and config.eval.calibration_batches > 0:
        from svol_tpu.data.pipeline import build_loader
        from svol_tpu.ops.quant import calibrate_scales

        logger.info(
            f"calibrating int8 scales on {config.eval.calibration_batches} batches")
        variables = {"params": state.params}
        if state.batch_stats is not None and len(state.batch_stats) > 0:
            variables["batch_stats"] = state.batch_stats
        calib_batches = (b for b, _meta in build_loader(config, "test"))
        try:
            quant = calibrate_scales(model, variables, calib_batches,
                                     max_batches=config.eval.calibration_batches)
        finally:
            calib_batches.close()
        extra_variables = {"quant": quant}

    platforms = (own.export_platforms.split(",")
                 if own.export_platforms else None)
    out = export_model(
        config, state, own.export_dir, batch_size=own.export_bs,
        pixel_dtype=own.export_pixels, extra_variables=extra_variables,
        platforms=platforms,
    )
    logger.info(f"exported serving artifact -> {out}")


if __name__ == "__main__":
    main()
