"""Orbax checkpointing (replaces torch.save dicts, train.py:267-284).

State saved: {params, batch_stats, opt_state, step} plus the config JSON, so
``--resume`` restores weights only and ``--resume_all`` restores the full
optimizer/scheduler/step state (configs.py:35-38 semantics — the LR schedule
is a pure function of step, so restoring step restores the schedule).

Naming matches the reference scheme: ``best_model_<run_tag>`` for the
best-metric checkpoint (train.py:340-343) and ``<iter>_model_<run_tag>``
for periodic saves (train.py:276-283).
"""
from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp

from svol_tpu.config import SvolConfig
from svol_tpu.train.state import TrainState


def _ckpt_dir(base: str, name: str) -> str:
    return os.path.abspath(os.path.join(base, name))


def save_checkpoint(
    base_dir: str,
    name: str,
    state: TrainState,
    config: SvolConfig,
) -> str:
    path = _ckpt_dir(base_dir, name)
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    with open(path + ".config.json", "w") as f:
        f.write(config.to_json())
    return path


def restore_checkpoint(
    path: str,
    state: TrainState,
    restore_all: bool = False,
) -> TrainState:
    """Load weights (and optionally full optimizer state) into ``state``.

    ``restore_all=False`` mirrors --resume (weights only, train.py:145-147);
    True mirrors --resume_all (train.py:148-152).
    """
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    restored = ckptr.restore(path, template)
    state = state.replace(
        params=restored["params"], batch_stats=restored["batch_stats"]
    )
    if restore_all:
        state = state.replace(
            opt_state=restored["opt_state"], step=restored["step"]
        )
    return state


def find_latest_checkpoint(base_dir: str) -> Optional[str]:
    """Most recently written checkpoint directory under ``base_dir`` (best or
    periodic), identified by its sidecar config; None if none exist."""
    if not os.path.isdir(base_dir):
        return None
    candidates = []
    for name in os.listdir(base_dir):
        path = os.path.join(base_dir, name)
        if os.path.isdir(path) and os.path.exists(path + ".config.json"):
            candidates.append((os.path.getmtime(path), path))
    return max(candidates)[1] if candidates else None


def best_checkpoint_name(config: SvolConfig) -> str:
    return f"best_model_{config.run_tag()}"


def periodic_checkpoint_name(config: SvolConfig, step: int) -> str:
    return f"{step:04d}_model_{config.run_tag()}"
