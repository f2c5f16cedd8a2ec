"""GPipe-style pipeline parallelism over the cross-modal transformer layers.

A new capability beyond the reference, which is data-parallel only (apex DDP,
SURVEY.md §2 parallelism checklist — reference lib/utils/comm.py:5-25,
train.py:124). Together with the 'seq' (sequence/context) and 'model'
(Megatron tensor) axes in parallel/mesh.py this completes the framework's
parallelism portfolio: dp x sp x tp x pp.

Design (idiomatic GSPMD — no shard_map, no per-stage processes):

* The transformer's ``num_layers`` identical layers become ONE vmapped
  submodule with stacked parameters (leading stage axis S = num_layers),
  sharded over the mesh's 'pipe' axis (mesh.py::param_partition_spec).
* Activations run the classic GPipe skew: the batch splits into M
  microbatches; a (S, mb, ...) rotating buffer holds one microbatch per
  stage; every tick all stages compute in parallel (one vmapped layer call —
  XLA partitions the stage axis over 'pipe') and the buffer shifts one stage
  (jnp.roll on the stage axis — XLA lowers it to a collective-permute over
  ICI when the axis is mesh-sharded).
* M + S - 1 ticks drain the pipeline; stage s's tick-t output is microbatch
  (t - s)'s layer-s activation. The per-layer query states SVANet's aux loss
  needs (svanet.py "aux_logits") are collected from each stage at the tick
  it produced them, so nothing is recomputed.
* The schedule is unrolled in Python (M and S are small static ints), which
  keeps collection as pure indexing — no in-loop scatters, no masks on the
  hot path. Bubble fraction is the textbook (S-1)/(M+S-1).

Differentiability falls out of the formulation: roll/stack/slice all have
transposes, so ``jax.grad`` of a pipelined step IS the reverse-skewed
backward pipeline — no manual schedule.

Semantics: microbatching only re-orders a batched computation whose examples
never interact inside the transformer (all attention is within-example), so
pipelined forward/backward are numerically the sequential results, not an
approximation (tests/test_pipeline_parallel.py asserts equality). Dropout
does not live inside the pipelined region (the reference keeps dropout in the
input projections, lib/modeling/svanet.py:51-60; the transformer layers have
none — cross_modal_transformer.py), so no RNG plumbing is needed.

Checkpoint interop: pipelined parameters live under one stacked
``transformer/layers`` subtree instead of ``transformer/layer{i}``;
``stack_transformer_layers`` / ``unstack_transformer_layers`` convert
checkpoints between the two layouts losslessly.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "microbatch_split",
    "microbatch_merge",
    "stack_transformer_layers",
    "unstack_transformer_layers",
]


def microbatch_split(x: jax.Array, num_microbatches: int) -> jax.Array:
    """(B, ...) -> (M, B/M, ...) where microbatch m holds rows ``m::M``.

    The strided assignment keeps each microbatch evenly spread over a
    'data'-sharded batch axis: the reshape (B,)->(B/M, M) splits every
    device's contiguous local rows locally (no resharding), and the moveaxis
    is a plain transpose. A contiguous-block split would instead concentrate
    each microbatch on a subset of the data devices.
    """
    B = x.shape[0]
    if B % num_microbatches:
        raise ValueError(
            f"batch {B} not divisible by pp_microbatches={num_microbatches}")
    mb = B // num_microbatches
    return jnp.moveaxis(
        x.reshape(mb, num_microbatches, *x.shape[1:]), 1, 0)


def microbatch_merge(x: jax.Array) -> jax.Array:
    """Inverse of :func:`microbatch_split`: (M, B/M, ...) -> (B, ...) with
    the original row order restored exactly."""
    M, mb = x.shape[0], x.shape[1]
    return jnp.moveaxis(x, 0, 1).reshape(mb * M, *x.shape[2:])


def _find_layer_keys(subtree: Dict[str, Any]) -> Tuple[str, ...]:
    keys = sorted(
        (k for k in subtree if k.startswith("layer") and k[5:].isdigit()),
        key=lambda k: int(k[5:]),
    )
    if not keys or [int(k[5:]) for k in keys] != list(range(len(keys))):
        raise ValueError(
            f"expected contiguous layer0..layerN keys, got {sorted(subtree)}")
    return tuple(keys)


def stack_transformer_layers(
    params: Dict[str, Any], path: Tuple[str, ...] = ("head", "transformer"),
) -> Dict[str, Any]:
    """Sequential checkpoint layout -> pipelined layout.

    Replaces the ``layer0..layerN`` subtrees under ``path`` with one
    ``layers`` subtree whose leaves carry a leading stage axis (the layout
    ``nn.vmap``'s stacked parameters use). Everything else is untouched;
    the input tree is not mutated.
    """
    import flax.core

    params = jax.tree.map(lambda x: x, flax.core.unfreeze(params))  # copy
    node = params
    for k in path:
        node = node[k]
    layer_keys = _find_layer_keys(node)
    stacked = jax.tree.map(
        lambda *leaves: jnp.stack(leaves), *[node[k] for k in layer_keys])
    for k in layer_keys:
        del node[k]
    node["layers"] = stacked
    return params


def unstack_transformer_layers(
    params: Dict[str, Any], path: Tuple[str, ...] = ("head", "transformer"),
) -> Dict[str, Any]:
    """Pipelined checkpoint layout -> sequential layout (exact inverse)."""
    import flax.core

    params = jax.tree.map(lambda x: x, flax.core.unfreeze(params))
    node = params
    for k in path:
        node = node[k]
    stacked = node.pop("layers")
    num_layers = jax.tree.leaves(stacked)[0].shape[0]
    for i in range(num_layers):
        node[f"layer{i}"] = jax.tree.map(lambda x, i=i: x[i], stacked)
    return params
