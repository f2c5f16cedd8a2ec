"""Mixture-of-Experts FFN with expert parallelism — capability beyond the
reference (which has a single dense MLP per transformer block,
lib/modeling/cross_modal_transformer.py:163-179 — and no parallelism beyond
DP, SURVEY.md §2 checklist).

Switch-Transformer-style top-1 routing, formulated the TPU way: no ragged
gathers, no data-dependent shapes. Dispatch is two static einsums against a
one-hot (tokens × experts × capacity) tensor, so the whole layer is three
MXU contractions plus the vmapped per-expert MLPs — and under an 'expert'
mesh axis GSPMD lowers the dispatch/combine einsums to an all-to-all while
each device holds only its experts' parameters (parallel/mesh.py).

Static-capacity semantics (the standard trade): each expert processes at
most ``capacity = ceil(capacity_factor · tokens / num_experts)`` tokens per
batch row; overflow tokens are dropped from the expert computation and
contribute zero to the MoE output — the transformer's residual connection
carries them through unchanged. The Switch load-balancing auxiliary loss
(num_experts · Σ_e fraction_e · router_prob_e, minimized at uniform routing
where it equals 1.0) is sown into the ``"moe"`` collection; the train step
adds it to the objective with weight ``--moe_aux_weight``
(train/steps.py). With ``num_experts == 1`` the layer reduces EXACTLY to
the dense TransformerMLP it replaces (softmax over one logit is 1.0, the
dispatch one-hots are a permutation): tests/test_moe.py.
"""
from __future__ import annotations

import math
import zlib
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from svol_tpu.models.layers import TransformerMLP


def upcycle_dense_mlp_tree(
    params: dict,
    num_experts: int,
    rng: jax.Array,
    router_init_scale: float = 0.02,
) -> dict:
    """Sparse upcycling (arXiv:2212.05055): convert a DENSE-model param tree
    into the MoE layout — every cross-modal-transformer ``mlp1``/``mlp2``
    dense MLP becomes an expert stack where each of the ``num_experts``
    experts starts as an exact copy of the dense MLP, plus a freshly
    initialized router (normal, ``router_init_scale``). This is the standard
    dense→MoE migration: the model starts from the dense optimum and the
    router learns to specialize the (initially identical) experts.

    Pure host-side tree transform, scoped to ``head/transformer/layer*/
    mlp{1,2}`` exactly like the partition rules (parallel/mesh.py) — other
    fc1/fc2 modules (e.g. the vanilla DETR heads) are never touched.
    """

    def convert(node: dict, rng: jax.Array) -> dict:
        fc1_kernel = node["fc1"]["kernel"]
        d_model = fc1_kernel.shape[0]
        tile = lambda p: jnp.broadcast_to(
            jnp.asarray(p)[None], (num_experts,) + tuple(p.shape)
        ).copy()
        return {
            "router": {
                "kernel": router_init_scale * jax.random.normal(
                    rng, (d_model, num_experts), jnp.float32
                ),
                "bias": jnp.zeros((num_experts,), jnp.float32),
            },
            "experts": jax.tree.map(tile, dict(node)),
        }

    def walk(node, path):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            sub = path + (k,)
            if (
                "transformer" in path
                and k in ("mlp1", "mlp2")
                and isinstance(v, dict)
                and "fc1" in v
                and "fc2" in v
            ):
                # distinct, path-deterministic router init per MoE layer
                sub_rng = jax.random.fold_in(
                    rng, zlib.crc32("/".join(sub).encode())
                )
                out[k] = convert(v, sub_rng)
            else:
                out[k] = walk(v, sub)
        return out

    return walk(params, ())


def downcycle_moe_mlp_tree(params: dict) -> dict:
    """Inverse template transform: MoE param layout -> the dense layout a
    dense checkpoint was written under (expert 0's weights, router dropped).
    Used to build the restore template for --moe_upcycle
    (train/checkpoints.py::restore_upcycled)."""

    def walk(node, path):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if (
                "transformer" in path
                and k in ("mlp1", "mlp2")
                and isinstance(v, dict)
                and "experts" in v
            ):
                out[k] = jax.tree.map(lambda p: p[0], dict(v["experts"]))
            else:
                out[k] = walk(v, path + (k,))
        return out

    return walk(params, ())


class MoEMLP(nn.Module):
    """Drop-in MoE replacement for TransformerMLP over (B, S, D) tokens."""

    num_experts: int
    hidden_features: int
    out_features: int
    capacity_factor: float = 1.25
    activation: str = "gelu"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from svol_tpu.parallel.mesh import shard_expert_tokens

        B, S, D = x.shape
        E = self.num_experts
        capacity = min(S, max(1, math.ceil(self.capacity_factor * S / E)))

        # Router runs in f32: the gate probabilities and the cumsum-based
        # position bookkeeping below must not see bf16 rounding.
        logits = nn.Dense(
            E, dtype=jnp.float32, param_dtype=jnp.float32, name="router"
        )(x.astype(jnp.float32))  # (B, S, E)
        probs = jax.nn.softmax(logits, axis=-1)
        gate = jnp.max(probs, axis=-1)  # (B, S) top-1 gate value
        expert_index = jnp.argmax(probs, axis=-1)  # (B, S)
        assign = jax.nn.one_hot(expert_index, E, dtype=jnp.float32)  # (B,S,E)

        # Position of each token within its expert's buffer, in token order
        # (cumsum includes self, hence -1). Tokens at position >= capacity
        # fall off the one-hot below and are dropped — static shapes, no
        # sorting, no scatter.
        position = jnp.cumsum(assign, axis=1) - 1.0  # (B, S, E)
        dispatch = assign[..., None] * jax.nn.one_hot(
            position, capacity, dtype=jnp.float32
        )  # (B, S, E, C) one-hot over (expert, slot), zero row if dropped
        combine = dispatch * gate[..., None, None]

        # Switch load-balancing loss: E * sum_e f_e * p_e, minimized (=1.0)
        # at uniform routing. Differentiable through p_e only — the f_e
        # factor is a hard count — exactly the Switch formulation.
        fraction = assign.mean(axis=(0, 1))  # (E,)
        prob_mass = probs.mean(axis=(0, 1))  # (E,)
        self.sow("moe", "aux_loss", E * jnp.sum(fraction * prob_mass))

        compute_dtype = self.dtype or x.dtype
        # (B,S,E,C) x (B,S,D) -> (E,B,C,D): the all-to-all under an 'expert'
        # mesh axis — each device receives only its experts' token buffers.
        expert_in = shard_expert_tokens(jnp.einsum(
            "bsec,bsd->ebcd", dispatch.astype(compute_dtype),
            x.astype(compute_dtype),
        ))
        experts = nn.vmap(
            TransformerMLP,
            in_axes=0,
            out_axes=0,
            variable_axes={"params": 0},  # stacked (E, ...) expert params
            split_rngs={"params": True},
        )(
            hidden_features=self.hidden_features,
            out_features=self.out_features,
            activation=self.activation,
            dtype=self.dtype,
            name="experts",
        )
        expert_out = shard_expert_tokens(experts(expert_in))  # (E, B, C, D)
        y = jnp.einsum(
            "bsec,ebcd->bsd", combine.astype(compute_dtype),
            expert_out.astype(compute_dtype),
        )
        return y.astype(x.dtype)
