"""Isolate the tunneled-TPU-worker crash seen with the merged matcher.

Round 1: compiling the merged (final+aux, one wide vmapped LSAP) matcher into
the FULL train step reproducibly crashed this environment's TPU worker
(3/3 attempts), while the standalone wide solve ran fine (PERFORMANCE.md).
This script runs each suspect in a fresh process so a worker crash is
attributable to exactly one stage:

    python scripts/repro_wide_matcher.py solve          # wide LSAP alone
    python scripts/repro_wide_matcher.py fwd_merged     # fwd+loss, merged
    python scripts/repro_wide_matcher.py train_unmerged # full step, per-layer
    python scripts/repro_wide_matcher.py train_merged   # full step, merged

Run under `timeout 600 ...`; a hang or nonzero exit marks the trigger.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _setup(merged: bool):
    from __graft_entry__ import _enable_compile_cache, _sample_batch

    _enable_compile_cache()
    from svol_tpu.config import SvolConfig
    from svol_tpu.losses.criterion import build_criterion
    from svol_tpu.models import build_model

    cfg = SvolConfig()
    cfg.loss.merged_matcher = merged
    model = build_model(cfg)
    criterion = build_criterion(cfg)
    batch = _sample_batch(cfg, batch_size=16, with_targets=True)
    return cfg, model, criterion, batch


def stage_solve(width: int = 1024) -> None:
    """The wide vmapped LSAP alone. width = number of stacked 10x10 problems
    (merged flagship train step = 2 layers x bs16 x T32 = 1024; the unmerged
    production path runs 512-wide solves)."""
    import jax
    import jax.numpy as jnp

    from svol_tpu.ops.hungarian import hungarian

    K = 10
    rng = np.random.default_rng(0)
    C = jnp.asarray(rng.uniform(size=(width, K, K)), jnp.float32)
    out = jax.jit(hungarian)(C)
    print(f"solve width={width} ok:", int(np.asarray(out).sum()))


def stage_fwd(merged: bool) -> None:
    """Forward + criterion (no backward) with/without the merged matcher."""
    import jax

    from __graft_entry__ import init_variables

    cfg, model, criterion, batch = _setup(merged)
    variables = init_variables(model, cfg)

    @jax.jit
    def fwd(variables, batch):
        outputs = model.apply(
            variables,
            src_sketch=batch["src_sketch"], src_video=batch["src_video"],
            src_sketch_mask=batch["src_sketch_mask"],
            src_video_mask=batch["src_video_mask"], train=False,
        )
        return criterion(
            outputs, {"boxes": batch["boxes"], "box_valid": batch["box_valid"]}
        )["loss_overall"]

    print(f"fwd merged={merged} loss={float(fwd(variables, batch)):.4f}")


def stage_train(merged: bool) -> None:
    """One full jit'd train step (forward+match+loss+backward+update)."""
    import jax

    from svol_tpu.train import create_train_state, make_train_step

    cfg, model, criterion, batch = _setup(merged)
    state = create_train_state(
        cfg, model, jax.random.PRNGKey(0),
        {k: batch[k] for k in ("src_sketch", "src_video",
                               "src_sketch_mask", "src_video_mask")},
    )
    step = make_train_step(cfg, criterion, donate=False)
    _, metrics = step(state, batch, jax.random.PRNGKey(1))
    print(f"train merged={merged} loss={float(metrics['loss_overall']):.4f}")


def main() -> None:
    stage = sys.argv[1] if len(sys.argv) > 1 else "solve"
    if stage == "solve":
        stage_solve(int(sys.argv[2]) if len(sys.argv) > 2 else 1024)
        return
    {
        "fwd_merged": lambda: stage_fwd(True),
        "fwd_unmerged": lambda: stage_fwd(False),
        "train_merged": lambda: stage_train(True),
        "train_unmerged": lambda: stage_train(False),
    }[stage]()


if __name__ == "__main__":
    main()
