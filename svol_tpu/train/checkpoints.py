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

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

from svol_tpu.config import SvolConfig
from svol_tpu.train.state import TrainState


def _ckpt_dir(base: str, name: str) -> str:
    return os.path.abspath(os.path.join(base, name))


# Long-lived checkpointer for --async_checkpoint saves: orbax's
# StandardCheckpointer IS an AsyncCheckpointer — save() returns once the
# arrays are snapshotted to host and the directory write proceeds on a
# background thread, so training overlaps the checkpoint IO. A singleton
# (not a per-call instance) because the background write must outlive the
# call, and because consecutive saves serialize against each other through
# wait_until_finished().
_ASYNC_CKPTR: Optional[ocp.StandardCheckpointer] = None


def _async_checkpointer() -> ocp.StandardCheckpointer:
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.StandardCheckpointer()
    return _ASYNC_CKPTR


def wait_for_checkpoints() -> None:
    """Block until every pending --async_checkpoint save has committed.
    Call before process exit (cli/train.py) or before reading back a path
    that may still be in flight. Idempotent; no-op when nothing is pending."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_checkpoint(
    base_dir: str,
    name: str,
    state: TrainState,
    config: SvolConfig,
    wait: bool = True,
    loader_state: Optional[bytes] = None,
) -> str:
    """``wait=False`` (--async_checkpoint): the device->host snapshot happens
    before this returns, but the directory write runs on a background thread
    — the train loop keeps stepping while the checkpoint commits. The next
    async save (or wait_for_checkpoints()) joins the previous write first,
    so a slow filesystem back-pressures at save points, never corrupts."""
    path = _ckpt_dir(base_dir, name)
    if wait:
        ckptr = ocp.StandardCheckpointer()
    else:
        ckptr = _async_checkpointer()
        ckptr.wait_until_finished()  # serialize with any in-flight save
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if state.ema_params is not None:  # --ema_decay: persist the shadow too
        payload["ema_params"] = state.ema_params
    ckptr.save(path, payload, force=True)
    if wait:
        ckptr.wait_until_finished()
    with open(path + ".config.json", "w") as f:
        f.write(config.to_json())
    if loader_state is not None:
        # grain input-stream position at exactly this checkpoint's step (see
        # data/pipeline.py::ResumableIterator) — restored by --resume_all so
        # the resumed run consumes the same batches the uninterrupted run
        # would have. Written atomically (rename) so a crash mid-save can't
        # leave a torn sidecar next to a valid checkpoint.
        tmp = path + ".loader_state.tmp"
        with open(tmp, "wb") as f:
            f.write(loader_state)
        os.replace(tmp, path + ".loader_state")
    return path


def load_loader_state(path: str) -> Optional[bytes]:
    """Read a checkpoint's grain input-stream sidecar, if one was saved."""
    sidecar = os.path.abspath(path) + ".loader_state"
    if not os.path.exists(sidecar):
        return None
    with open(sidecar, "rb") as f:
        return f.read()


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
    has_ema = state.ema_params is not None
    try:  # does the on-disk tree carry an EMA shadow (--ema_decay run)?
        ckpt_has_ema = "ema_params" in ckptr.metadata(path).item_metadata
    except BaseException:  # noqa: BLE001 — metadata probe only
        ckpt_has_ema = False
    if ckpt_has_ema:
        # template must mirror the on-disk tree; ema mirrors the params
        # (restored-but-dropped when this run has EMA off)
        template["ema_params"] = (state.ema_params if has_ema
                                  else state.params)
    try:
        restored = ckptr.restore(path, template)
    except BaseException as e:  # noqa: BLE001 — inspected, then re-raised
        # Pipeline parallelism stores the transformer as ONE stacked
        # 'layers' subtree instead of 'layer{i}' (parallel/pipeline.py), so
        # a checkpoint written under the other layout mismatches the
        # template. Retry through the converters — weights only; a full
        # optimizer-state conversion across layouts is not supported.
        restored = _restore_converted(ckptr, path, template, e)
        if restore_all:
            raise ValueError(
                "--resume_all across pipeline layouts (sequential <-> "
                "pp_devices>1) is not supported; use --resume (weights "
                "only) — optimizer state cannot be converted"
            ) from e
    state = state.replace(
        params=restored["params"], batch_stats=restored["batch_stats"]
    )
    if has_ema:
        # EMA-carrying checkpoint restores its shadow; resuming a plain
        # checkpoint into an --ema_decay run seeds the shadow at the
        # restored params — as a COPY, never an alias (aliased buffers
        # break the donated train step: "donate the same buffer twice")
        state = state.replace(
            ema_params=restored.get(
                "ema_params",
                jax.tree.map(jnp.array, restored["params"])))
    if restore_all:
        state = state.replace(
            opt_state=restored["opt_state"], step=restored["step"]
        )
    return state


def restore_upcycled(
    path: str,
    state: TrainState,
    num_experts: int,
    rng,
    router_init_scale: float = 0.02,
) -> TrainState:
    """--moe_upcycle: load a DENSE checkpoint into an MoE train state by
    sparse upcycling (models/moe.py::upcycle_dense_mlp_tree) — every expert
    starts as a copy of the checkpoint's dense MLP, routers are freshly
    initialized, everything else (backbone, attention, heads, batch_stats)
    restores verbatim. Weights-only by construction: the optimizer state
    shapes differ between the layouts (same restriction as the pipeline
    layout conversion above)."""
    from svol_tpu.models.moe import (
        downcycle_moe_mlp_tree,
        upcycle_dense_mlp_tree,
    )

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    # the on-disk tree is fully dense: downcycle the params AND the
    # param-shaped subtrees inside the optimizer state (adam mu/nu mirror
    # the param tree) so the template matches; opt_state/step are then
    # discarded (weights-only restore)
    template = {
        "params": downcycle_moe_mlp_tree(state.params),
        "batch_stats": state.batch_stats,
        "opt_state": _map_param_trees(state.opt_state,
                                      downcycle_moe_mlp_tree),
        "step": state.step,
    }
    restored = ckptr.restore(path, template)
    params = upcycle_dense_mlp_tree(
        restored["params"], num_experts, rng,
        router_init_scale=router_init_scale,
    )
    return state.replace(
        params=params, batch_stats=restored["batch_stats"]
    )


def _map_param_trees(obj, fn):
    """Apply ``fn`` to every param-shaped subtree (a dict with a
    head/transformer path) inside ``obj`` — the params tree itself and the
    optimizer-state trees that mirror it (adam mu/nu), recursing through
    dicts, (named)tuples, and lists."""
    if isinstance(obj, dict):
        head = obj.get("head")
        if isinstance(head, dict) and "transformer" in head:
            return fn(obj)
        return {k: _map_param_trees(v, fn) for k, v in obj.items()}
    if isinstance(obj, tuple):
        vals = [_map_param_trees(v, fn) for v in obj]
        return type(obj)(*vals) if hasattr(obj, "_fields") else tuple(vals)
    if isinstance(obj, list):
        return [_map_param_trees(v, fn) for v in obj]
    return obj


def _restore_converted(ckptr, path: str, template, original_error):
    """Retry a layout-mismatched restore by converting every param-shaped
    subtree in the template between the sequential (layer{i}) and pipelined
    (stacked 'layers') layouts so it matches the on-disk tree, then convert
    the restored params back to the state's layout. Re-raises the original
    error when the mismatch isn't the pipeline layout."""
    from svol_tpu.parallel.pipeline import (
        stack_transformer_layers,
        unstack_transformer_layers,
    )

    params = template["params"]
    try:
        pipelined_state = "layers" in params["head"]["transformer"]
    except (KeyError, TypeError):
        raise original_error
    to_disk = (unstack_transformer_layers if pipelined_state
               else stack_transformer_layers)
    to_state = (stack_transformer_layers if pipelined_state
                else unstack_transformer_layers)
    try:
        alt = _map_param_trees(template, to_disk)
        restored = ckptr.restore(path, alt)
        restored["params"] = to_state(restored["params"])
    except BaseException:
        raise original_error
    return restored


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
