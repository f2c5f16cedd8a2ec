"""Port pretrained torch checkpoints into our Flax parameter trees.

The reference initializes its backbones from torchvision ImageNet weights
(backbone.py:135-137) and HF ViT weights (backbone.py:118-122). This
environment has no network egress, so weights can't be downloaded here —
instead these converters map a *provided* state dict file onto our NHWC Flax
modules tensor-for-tensor:

  * torchvision resnet18/34/50 ``.pth`` -> svol_tpu.models.resnet.ResNet
    (OIHW conv -> HWIO, BN weight/bias/running stats -> scale/bias/mean/var,
    ``layer{i}.{j}`` -> ``layer{i}_{j}``, downsample 0/1 -> conv/bn)
  * HF ViTModel state dict -> svol_tpu.models.vit.ViT

Accepted inputs: a ``.pth``/``.bin`` torch file (loaded via torch, CPU), an
``.npz`` with the same key names, or an in-memory dict of numpy arrays.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def load_state_dict(path_or_dict) -> Dict[str, np.ndarray]:
    if isinstance(path_or_dict, Mapping):
        return {k: np.asarray(v) for k, v in path_or_dict.items()}
    path = str(path_or_dict)
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if isinstance(sd, dict) and "model" in sd and not hasattr(sd["model"], "shape"):
        sd = sd["model"]
    return {k: v.numpy() for k, v in sd.items()}


def _conv(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _bn(sd: Dict[str, np.ndarray], prefix: str) -> tuple:
    params = {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}
    stats = {"mean": sd[prefix + ".running_mean"], "var": sd[prefix + ".running_var"]}
    return params, stats


def convert_resnet(
    state_dict, stage_sizes, bottleneck: bool = False, stem: str = "conv7"
) -> Dict[str, Any]:
    """torchvision resnet state dict -> {'params': ..., 'batch_stats': ...}
    matching svol_tpu.models.resnet.ResNet's tree. ``stem='space_to_depth'``
    additionally rearranges conv1 into the equivalent s2d layout
    (models/resnet.py:conv7_to_s2d_kernel) — lossless."""
    sd = load_state_dict(state_dict)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    k1 = _conv(sd["conv1.weight"])
    if stem == "space_to_depth":
        from svol_tpu.models.resnet import conv7_to_s2d_kernel

        params["conv1_s2d"] = {"kernel": np.asarray(conv7_to_s2d_kernel(k1))}
    else:
        params["conv1"] = {"kernel": k1}
    params["bn1"], stats["bn1"] = _bn(sd, "bn1")

    n_convs = 3 if bottleneck else 2
    for stage, n_blocks in enumerate(stage_sizes, start=1):
        for b in range(n_blocks):
            src = f"layer{stage}.{b}"
            dst = f"layer{stage}_{b}"
            block_p: Dict[str, Any] = {}
            block_s: Dict[str, Any] = {}
            for c in range(1, n_convs + 1):
                block_p[f"conv{c}"] = {"kernel": _conv(sd[f"{src}.conv{c}.weight"])}
                block_p[f"bn{c}"], block_s[f"bn{c}"] = _bn(sd, f"{src}.bn{c}")
            if f"{src}.downsample.0.weight" in sd:
                block_p["downsample_conv"] = {
                    "kernel": _conv(sd[f"{src}.downsample.0.weight"])
                }
                block_p["downsample_bn"], block_s["downsample_bn"] = _bn(
                    sd, f"{src}.downsample.1"
                )
            params[dst] = block_p
            stats[dst] = block_s
    return {"params": params, "batch_stats": stats}


def convert_resnet18(state_dict, stem: str = "conv7"):
    return convert_resnet(state_dict, (2, 2, 2, 2), stem=stem)


def convert_resnet34(state_dict, stem: str = "conv7"):
    return convert_resnet(state_dict, (3, 4, 6, 3), stem=stem)


def convert_resnet50(state_dict, stem: str = "conv7"):
    return convert_resnet(state_dict, (3, 4, 6, 3), bottleneck=True, stem=stem)


def convert_hf_vit(
    state_dict, num_layers: int = 12, image_size: int = 224, patch_size: int = 16
) -> Dict[str, Any]:
    """HF ViTModel state dict -> svol_tpu.models.vit.ViT params.

    ``image_size``/``patch_size`` describe the *target* model; the grafted
    position embeddings must match its token count (checked eagerly here —
    a silent mismatch would only surface later as an opaque shape error at
    restore/apply time).
    """
    sd = load_state_dict(state_dict)
    n_tokens = (image_size // patch_size) ** 2 + 1
    pos_len = sd["embeddings.position_embeddings"].shape[-2]
    if pos_len != n_tokens:
        raise ValueError(
            f"position_embeddings cover {pos_len} tokens but a "
            f"{image_size}x{image_size}/p{patch_size} ViT expects {n_tokens}; "
            "resize the checkpoint's pos_embed (bicubic grid interpolation) "
            "or pass the matching image_size."
        )

    def lin(prefix):  # torch (out, in) -> flax (in, out)
        return {"kernel": sd[prefix + ".weight"].T, "bias": sd[prefix + ".bias"]}

    def ln(prefix):
        return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    p: Dict[str, Any] = {
        "cls_token": sd["embeddings.cls_token"],
        "pos_embed": sd["embeddings.position_embeddings"],
        "patch_embed": {
            "kernel": _conv(sd["embeddings.patch_embeddings.projection.weight"]),
            "bias": sd["embeddings.patch_embeddings.projection.bias"],
        },
        "ln_final": ln("layernorm"),
    }
    for i in range(num_layers):
        src = f"encoder.layer.{i}"
        p[f"layer{i}"] = {
            "ln_before": ln(f"{src}.layernorm_before"),
            "ln_after": ln(f"{src}.layernorm_after"),
            "q": lin(f"{src}.attention.attention.query"),
            "k": lin(f"{src}.attention.attention.key"),
            "v": lin(f"{src}.attention.attention.value"),
            "attn_out": lin(f"{src}.attention.output.dense"),
            "mlp_in": lin(f"{src}.intermediate.dense"),
            "mlp_out": lin(f"{src}.output.dense"),
        }
    return {"params": p}


def _mha(sd: Dict[str, np.ndarray], prefix: str, d_model: int) -> Dict[str, Any]:
    """torch.nn.MultiheadAttention state -> our MultiheadAttention tree.

    torch packs q/k/v as ``in_proj_weight`` (3D, D) rows; our module keeps
    separate Dense submodules with (in, out) kernels, so each slice is
    transposed (models/layers.py:32-66).
    """
    w = sd[prefix + ".in_proj_weight"]
    b = sd[prefix + ".in_proj_bias"]
    out: Dict[str, Any] = {}
    for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
        out[name] = {
            "kernel": w[i * d_model:(i + 1) * d_model].T,
            "bias": b[i * d_model:(i + 1) * d_model],
        }
    out["out_proj"] = {
        "kernel": sd[prefix + ".out_proj.weight"].T,
        "bias": sd[prefix + ".out_proj.bias"],
    }
    return out


def convert_svanet(
    state_dict, num_layers: int = 2, n_input_proj: int = 2, d_model: int = 256
) -> Dict[str, Any]:
    """Reference-SVANet torch state dict -> our Flax SVANet params.

    Maps every live parameter of /root/reference/lib/modeling/svanet.py +
    cross_modal_transformer.py onto svol_tpu.models.svanet.SVANet's tree:
      * input_{video,sketch}_proj.{i}.{LayerNorm,net.1}  -> proj{i}/{norm,linear}
      * query_embed.weight                               -> query_embed
      * transformer.layers.{i}.sketch_video_cross_attn   -> q/k projections of
        GatedSketchVideoAttention (its value/out_proj weights are dead in the
        reference too — only the attention *weights* are used as the gate,
        cross_modal_transformer.py:124-125)
      * {content_self,token_self,content_token_cross}_attn, norm1-6, mlp1/2
      * class_embed / bbox_embed.layers.{i}
    Dead reference parameters (class_head, gate value/out_proj) are skipped.
    Returns {'params': ...} ready to merge over a model.init tree.
    """
    sd = load_state_dict(state_dict)

    def lin(prefix):
        return {"kernel": sd[prefix + ".weight"].T, "bias": sd[prefix + ".bias"]}

    def ln(prefix):
        return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    def input_proj(prefix):
        return {
            f"proj{i}": {
                "norm": ln(f"{prefix}.{i}.LayerNorm"),
                "linear": lin(f"{prefix}.{i}.net.1"),
            }
            for i in range(n_input_proj)
        }

    p: Dict[str, Any] = {
        "input_video_proj": input_proj("input_video_proj"),
        "input_sketch_proj": input_proj("input_sketch_proj"),
        "query_embed": sd["query_embed.weight"],
        "class_embed": lin("class_embed"),
        "bbox_embed": {
            f"layer{i}": lin(f"bbox_embed.layers.{i}") for i in range(3)
        },
    }
    tr: Dict[str, Any] = {}
    for i in range(num_layers):
        src = f"transformer.layers.{i}"
        in_w = sd[f"{src}.sketch_video_cross_attn.in_proj_weight"]
        in_b = sd[f"{src}.sketch_video_cross_attn.in_proj_bias"]
        layer: Dict[str, Any] = {
            "sketch_video_cross_attn": {
                "q_proj_kernel": in_w[:d_model].T,
                "q_proj_bias": in_b[:d_model],
                "k_proj_kernel": in_w[d_model:2 * d_model].T,
                "k_proj_bias": in_b[d_model:2 * d_model],
            },
            "content_self_attn": _mha(sd, f"{src}.content_self_attn", d_model),
            "token_self_attn": _mha(sd, f"{src}.token_self_attn", d_model),
            "content_token_cross_attn": _mha(
                sd, f"{src}.content_token_cross_attn", d_model
            ),
            "mlp1": {"fc1": lin(f"{src}.mlp1.fc1"), "fc2": lin(f"{src}.mlp1.fc2")},
            "mlp2": {"fc1": lin(f"{src}.mlp2.fc1"), "fc2": lin(f"{src}.mlp2.fc2")},
        }
        for n in range(1, 7):
            layer[f"norm{n}"] = ln(f"{src}.norm{n}")
        tr[f"layer{i}"] = layer
    p["transformer"] = tr
    return {"params": p}


# nn.Sequential(*resnet.children()) index -> torchvision submodule name; the
# reference wraps its backbones this way (lib/modeling/backbone.py:137-141),
# so a trained SVOL checkpoint stores e.g. backbone.video_backbone.4.0.conv1
_SEQ_TO_TORCHVISION = {
    "0": "conv1", "1": "bn1", "4": "layer1", "5": "layer2",
    "6": "layer3", "7": "layer4",
}


def split_reference_state_dict(state_dict):
    """A reference-trained full SVOL checkpoint ('model' state dict,
    train.py:269-276) -> (video_backbone_sd, sketch_backbone_sd, head_sd)
    with torchvision-style / bare-head key names, ready for
    convert_resnet34/convert_resnet18/convert_svanet."""
    sd = load_state_dict(state_dict)
    vid: Dict[str, np.ndarray] = {}
    skt: Dict[str, np.ndarray] = {}
    head: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        for prefix, out in (("backbone.video_backbone.", vid),
                            ("backbone.sketch_backbone.", skt)):
            if k.startswith(prefix):
                idx, _, tail = k[len(prefix):].partition(".")
                name = _SEQ_TO_TORCHVISION.get(idx)
                if name is not None:  # relu/maxpool/avgpool carry no params
                    out[f"{name}.{tail}"] = v
                break
        else:
            if k.startswith("head."):
                head[k[len("head."):]] = v
    if not (vid and skt and head):
        raise ValueError(
            "not a reference SVOL checkpoint: expected backbone.video_backbone.*, "
            f"backbone.sketch_backbone.* and head.* keys, got {len(vid)}/"
            f"{len(skt)}/{len(head)} matches over {len(sd)} keys"
        )
    return vid, skt, head


def _assert_tree_matches(converted, target, path: str) -> None:
    """Every converted leaf must exist in the init tree with the same shape
    (the converse is allowed: init-only leaves keep their fresh values)."""
    if isinstance(converted, Mapping):
        for k, v in converted.items():
            if not isinstance(target, Mapping) or k not in target:
                raise ValueError(f"ported parameter {path}/{k} not in model tree")
            _assert_tree_matches(v, target[k], f"{path}/{k}")
        return
    cs, ts = np.shape(converted), np.shape(target)
    if cs != ts:
        raise ValueError(f"shape mismatch at {path}: ported {cs} vs model {ts}")


def convert_reference_model(state_dict, config) -> Dict[str, Any]:
    """Reference-trained full SVOL checkpoint -> our full-model variables
    fragment {'params': ..., 'batch_stats': ...} (backbone + svanet head).

    Only the svanet head + resnet backbone combination (every reference
    recipe, train_quickdraw.sh:28) is portable — that is the only
    architecture the reference ever checkpoints.
    """
    if config.model.sketch_head != "svanet" or config.model.backbone != "resnet":
        raise NotImplementedError(
            "reference checkpoints are resnet+svanet (the only trained "
            f"configuration upstream); config has {config.model.backbone}+"
            f"{config.model.sketch_head}"
        )
    vid, skt, head = split_reference_state_dict(state_dict)
    stem = config.model.resnet_stem
    v = convert_resnet34(vid, stem=stem)
    s = convert_resnet18(skt, stem=stem)
    h = convert_svanet(head, num_layers=config.model.num_layers,
                       n_input_proj=config.model.n_input_proj,
                       d_model=config.model.hidden_dim)
    return {
        "params": {
            "backbone": {"video_backbone": v["params"],
                         "sketch_backbone": s["params"]},
            "head": h["params"],
        },
        "batch_stats": {
            "backbone": {"video_backbone": v["batch_stats"],
                         "sketch_backbone": s["batch_stats"]},
        },
    }


def build_reference_checkpoint(config, ref_ckpt: str, out_dir: str,
                               name: str = "reference_port") -> str:
    """Create a ``--resume``-able checkpoint carrying ALL weights of a
    reference-trained SVOL checkpoint (backbone + head) — the migration path
    for users switching from the reference with a trained model in hand.
    Leaves with no reference counterpart (none for svanet) stay fresh."""
    import jax

    from svol_tpu.models import build_model
    from svol_tpu.train.checkpoints import save_checkpoint
    from svol_tpu.train.state import create_train_state

    model = build_model(config)
    S = config.data.image_size
    sample = {
        "src_sketch": np.zeros((1, 1, S, S, 3), np.float32),
        "src_video": np.zeros((1, 1, S, S, 3), np.float32),
        "src_sketch_mask": np.ones((1, 1), np.float32),
        "src_video_mask": np.ones((1, 1), np.float32),
    }
    state = create_train_state(
        config, model, jax.random.PRNGKey(config.train.seed), sample
    )
    import flax

    variables = flax.core.unfreeze(
        {"params": state.params, "batch_stats": state.batch_stats})
    ported = convert_reference_model(ref_ckpt, config)
    _assert_tree_matches(ported["params"], variables["params"], "params")
    _assert_tree_matches(ported["batch_stats"], variables["batch_stats"],
                         "batch_stats")

    def merge(dst, src):
        for k, v in src.items():
            if isinstance(v, Mapping):
                merge(dst[k], v)
            else:
                dst[k] = v

    merge(variables["params"], ported["params"])
    merge(variables["batch_stats"], ported["batch_stats"])
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"])
    return save_checkpoint(out_dir, name, state, config)


def build_pretrained_checkpoint(
    config, video_ckpt: str, sketch_ckpt: str, out_dir: str, name: str = "pretrained_init"
) -> str:
    """Create a ``--resume``-able checkpoint whose backbone carries ported
    torchvision/HF weights and whose head is freshly initialized — the
    equivalent of the reference starting from IMAGENET1K weights
    (backbone.py:135-137). Returns the checkpoint path.
    """
    import jax

    from svol_tpu.models import build_model
    from svol_tpu.train.checkpoints import save_checkpoint
    from svol_tpu.train.state import create_train_state

    model = build_model(config)
    S = config.data.image_size
    import numpy as np_

    sample = {
        "src_sketch": np_.zeros((1, 1, S, S, 3), np_.float32),
        "src_video": np_.zeros((1, 1, S, S, 3), np_.float32),
        "src_sketch_mask": np_.ones((1, 1), np_.float32),
        "src_video_mask": np_.ones((1, 1), np_.float32),
    }
    state = create_train_state(
        config, model, jax.random.PRNGKey(config.train.seed), sample
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    variables = load_backbone_weights(
        variables, config.model.backbone,
        video_ckpt=video_ckpt, sketch_ckpt=sketch_ckpt,
        stem=config.model.resnet_stem,
    )
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    return save_checkpoint(out_dir, name, state, config)


# ---------------------------------------------------------------------------
# Reverse port: our Flax trees -> reference torch state dicts. Together with
# convert_reference_model above this makes migration BIDIRECTIONAL — a model
# trained here loads into the reference's torch stack (test.py / visualize.py)
# with load_state_dict(strict=True).
# ---------------------------------------------------------------------------


def _unconv(w: np.ndarray) -> np.ndarray:
    """flax HWIO -> torch OIHW (inverse of _conv)."""
    return np.transpose(np.asarray(w, np.float32), (3, 2, 0, 1))


def s2d_to_conv7_kernel(k: np.ndarray) -> np.ndarray:
    """Inverse of models/resnet.py::conv7_to_s2d_kernel: the (4, 4, 4C, F)
    space-to-depth stem kernel back to the exactly-equivalent (7, 7, C, F)
    conv7 layout (drop the zero pad row/col the forward transform added)."""
    k = np.asarray(k)
    C, F = k.shape[2] // 4, k.shape[3]
    kp = k.reshape(4, 4, 2, 2, C, F)  # (q_i, r_j, di, dj, C, F)
    kp = kp.transpose(0, 2, 1, 3, 4, 5)  # (q_i, di, r_j, dj, C, F)
    return kp.reshape(8, 8, C, F)[1:, 1:]


def _unbn(p, s) -> Dict[str, np.ndarray]:
    return {
        "weight": np.asarray(p["scale"], np.float32),
        "bias": np.asarray(p["bias"], np.float32),
        "running_mean": np.asarray(s["mean"], np.float32),
        "running_var": np.asarray(s["var"], np.float32),
        # torch BN bookkeeping our BN doesn't have; 0 is what a fresh torch
        # module holds and nothing reads it at inference
        "num_batches_tracked": np.zeros((), np.int64),
    }


def export_resnet_state_dict(params, batch_stats,
                             stem: str = "conv7") -> Dict[str, np.ndarray]:
    """svol_tpu ResNet {params, batch_stats} -> torchvision-style state dict
    (inverse of convert_resnet; roundtrip-exact, tests/test_torch_export.py)."""
    sd: Dict[str, np.ndarray] = {}
    if stem == "space_to_depth":
        sd["conv1.weight"] = _unconv(s2d_to_conv7_kernel(
            params["conv1_s2d"]["kernel"]))
    else:
        sd["conv1.weight"] = _unconv(params["conv1"]["kernel"])
    for k, v in _unbn(params["bn1"], batch_stats["bn1"]).items():
        sd[f"bn1.{k}"] = v
    for name in sorted(k for k in params if k.startswith("layer")):
        stage_b = name[len("layer"):]
        stage, b = stage_b.split("_")
        dst = f"layer{stage}.{b}"
        block_p, block_s = params[name], batch_stats[name]
        for sub in block_p:
            if sub.startswith("conv"):
                sd[f"{dst}.{sub}.weight"] = _unconv(block_p[sub]["kernel"])
            elif sub.startswith("bn"):
                for k, v in _unbn(block_p[sub], block_s[sub]).items():
                    sd[f"{dst}.{sub}.{k}"] = v
            elif sub == "downsample_conv":
                sd[f"{dst}.downsample.0.weight"] = _unconv(block_p[sub]["kernel"])
            elif sub == "downsample_bn":
                for k, v in _unbn(block_p[sub], block_s[sub]).items():
                    sd[f"{dst}.downsample.1.{k}"] = v
    return sd


def _unlin(tree) -> Dict[str, np.ndarray]:
    return {"weight": np.asarray(tree["kernel"], np.float32).T,
            "bias": np.asarray(tree["bias"], np.float32)}


def _unln(tree) -> Dict[str, np.ndarray]:
    return {"weight": np.asarray(tree["scale"], np.float32),
            "bias": np.asarray(tree["bias"], np.float32)}


def _unmha(tree, d_model: int) -> Dict[str, np.ndarray]:
    """Inverse of _mha: separate q/k/v Dense trees -> torch packed in_proj."""
    w = np.concatenate([np.asarray(tree[n]["kernel"], np.float32).T
                        for n in ("q_proj", "k_proj", "v_proj")], axis=0)
    b = np.concatenate([np.asarray(tree[n]["bias"], np.float32)
                        for n in ("q_proj", "k_proj", "v_proj")], axis=0)
    out = {"in_proj_weight": w, "in_proj_bias": b}
    out["out_proj.weight"] = np.asarray(tree["out_proj"]["kernel"],
                                        np.float32).T
    out["out_proj.bias"] = np.asarray(tree["out_proj"]["bias"], np.float32)
    return out


def export_svanet_state_dict(params, d_model: int, num_layers: int,
                             n_input_proj: int = 2,
                             num_classes: int = 2) -> Dict[str, np.ndarray]:
    """svol_tpu SVANet params -> the reference SVANet's FULL torch state dict
    (inverse of convert_svanet). The reference's dead parameters — its gate
    attention's value/out_proj rows (it only consumes the attention weights,
    cross_modal_transformer.py:124-125) and the unused ``class_head`` — have
    no counterpart here and are emitted as zeros so load_state_dict(strict=
    True) succeeds; they never influence the reference's outputs."""
    sd: Dict[str, np.ndarray] = {}
    for side in ("video", "sketch"):
        proj = params[f"input_{side}_proj"]
        for i in range(n_input_proj):
            for k, v in _unln(proj[f"proj{i}"]["norm"]).items():
                sd[f"input_{side}_proj.{i}.LayerNorm.{k}"] = v
            for k, v in _unlin(proj[f"proj{i}"]["linear"]).items():
                sd[f"input_{side}_proj.{i}.net.1.{k}"] = v
    sd["query_embed.weight"] = np.asarray(params["query_embed"], np.float32)
    for k, v in _unlin(params["class_embed"]).items():
        sd[f"class_embed.{k}"] = v
    for i in range(3):
        for k, v in _unlin(params["bbox_embed"][f"layer{i}"]).items():
            sd[f"bbox_embed.layers.{i}.{k}"] = v
    # dead in the reference (never used in its forward): zeros, right shapes
    sd["class_head.weight"] = np.zeros((num_classes, d_model), np.float32)
    sd["class_head.bias"] = np.zeros((num_classes,), np.float32)

    tr = params["transformer"]
    if "layers" in tr:  # pipelined (stacked) layout -> sequential first
        from svol_tpu.parallel.pipeline import unstack_transformer_layers

        tr = unstack_transformer_layers({"head": {"transformer": tr}}
                                        )["head"]["transformer"]
    for i in range(num_layers):
        layer = tr[f"layer{i}"]
        if "experts" in layer.get("mlp1", {}):
            raise NotImplementedError(
                "MoE layouts have no reference torch counterpart; "
                "export a dense model (or downcycle first)")
        dst = f"transformer.layers.{i}"
        gate = layer["sketch_video_cross_attn"]
        q_w = np.asarray(gate["q_proj_kernel"], np.float32).T
        k_w = np.asarray(gate["k_proj_kernel"], np.float32).T
        sd[f"{dst}.sketch_video_cross_attn.in_proj_weight"] = np.concatenate(
            [q_w, k_w, np.zeros_like(q_w)], axis=0)  # v rows: dead upstream
        sd[f"{dst}.sketch_video_cross_attn.in_proj_bias"] = np.concatenate(
            [np.asarray(gate["q_proj_bias"], np.float32),
             np.asarray(gate["k_proj_bias"], np.float32),
             np.zeros((d_model,), np.float32)])
        sd[f"{dst}.sketch_video_cross_attn.out_proj.weight"] = np.zeros(
            (d_model, d_model), np.float32)  # dead upstream
        sd[f"{dst}.sketch_video_cross_attn.out_proj.bias"] = np.zeros(
            (d_model,), np.float32)
        for attn in ("content_self_attn", "token_self_attn",
                     "content_token_cross_attn"):
            for k, v in _unmha(layer[attn], d_model).items():
                sd[f"{dst}.{attn}.{k}"] = v
        for mlp in ("mlp1", "mlp2"):
            for fc in ("fc1", "fc2"):
                for k, v in _unlin(layer[mlp][fc]).items():
                    sd[f"{dst}.{mlp}.{fc}.{k}"] = v
        for n in range(1, 7):
            for k, v in _unln(layer[f"norm{n}"]).items():
                sd[f"{dst}.norm{n}.{k}"] = v
    return sd


def export_reference_state_dict(variables, config) -> Dict[str, np.ndarray]:
    """Full svol_tpu model variables -> the reference's full-model torch
    state dict ('backbone.{video,sketch}_backbone.<seq_idx>.*' + 'head.*'
    keys, train.py:269-276) — the exact inverse of convert_reference_model,
    so a model trained HERE runs through the reference's test.py/visualize.py
    unchanged. resnet+svanet only (the only architecture upstream trains)."""
    if config.model.sketch_head != "svanet" or config.model.backbone != "resnet":
        raise NotImplementedError(
            "reference checkpoints are resnet+svanet; config has "
            f"{config.model.backbone}+{config.model.sketch_head}")
    p, s = variables["params"], variables["batch_stats"]
    seq = {v: k for k, v in _SEQ_TO_TORCHVISION.items()}
    sd: Dict[str, np.ndarray] = {}
    for which in ("video_backbone", "sketch_backbone"):
        flat = export_resnet_state_dict(
            p["backbone"][which], s["backbone"][which],
            stem=config.model.resnet_stem)
        for k, v in flat.items():
            head_name, _, tail = k.partition(".")
            sd[f"backbone.{which}.{seq[head_name]}.{tail}"] = v
    head_sd = export_svanet_state_dict(
        p["head"], d_model=config.model.hidden_dim,
        num_layers=config.model.num_layers,
        n_input_proj=config.model.n_input_proj,
        num_classes=config.model.num_classes)
    for k, v in head_sd.items():
        sd[f"head.{k}"] = v
    return sd


def export_torch_checkpoint(config, ckpt_path: str, out_path: str) -> str:
    """Load an orbax checkpoint trained here and write the reference-format
    torch checkpoint ({'model': state_dict}, the shape test.py's --resume
    loads). ``.npz`` output skips torch entirely."""
    import jax

    from svol_tpu.models import build_model
    from svol_tpu.train.checkpoints import restore_checkpoint
    from svol_tpu.train.state import create_train_state

    model = build_model(config)
    S = config.data.image_size
    sample = {
        "src_sketch": np.zeros((1, 1, S, S, 3), np.float32),
        "src_video": np.zeros((1, 1, S, S, 3), np.float32),
        "src_sketch_mask": np.ones((1, 1), np.float32),
        "src_video_mask": np.ones((1, 1), np.float32),
    }
    state = create_train_state(
        config, model, jax.random.PRNGKey(config.train.seed), sample)
    state = restore_checkpoint(ckpt_path, state)
    sd = export_reference_state_dict(
        {"params": state.params, "batch_stats": state.batch_stats}, config)
    if out_path.endswith(".npz"):
        np.savez(out_path, **sd)
    else:
        import torch

        torch.save({"model": {k: torch.from_numpy(np.ascontiguousarray(v))
                              for k, v in sd.items()}}, out_path)
    return out_path


def main(argv=None) -> None:
    """CLI: port torch backbone weights into a resumable checkpoint.

    python -m svol_tpu.utils.torch_port --backbone resnet \
        --video_ckpt resnet34.pth --sketch_ckpt resnet18.pth --out ./save
    then train with:  --resume ./save/pretrained_init
    """
    import argparse

    from svol_tpu.config import SvolConfig

    p = argparse.ArgumentParser(
        description="torch->flax weight port: either pretrained *backbone* "
        "checkpoints (torchvision resnet .pth / HF ViTModel) for a fresh "
        "head, or a full reference-trained SVOL checkpoint "
        "(--reference_ckpt, 'model' state dict) carrying backbone AND head."
    )
    p.add_argument("--backbone", default="resnet", choices=["resnet", "vit"])
    p.add_argument("--video_ckpt", default="")
    p.add_argument("--sketch_ckpt", default="")
    p.add_argument("--reference_ckpt", default="",
                   help="reference-trained full SVOL checkpoint; ports "
                        "backbone + svanet head (migration path)")
    p.add_argument("--export_torch", default="",
                   help="REVERSE port: an orbax checkpoint trained here -> "
                        "a reference-format torch checkpoint ({'model': "
                        "state_dict}) usable by the reference's test.py; "
                        "the config is read from the checkpoint's sidecar "
                        ".config.json; --out names the output .pth/.npz file")
    p.add_argument("--out", default="./save")
    p.add_argument("--name", default="")
    args = p.parse_args(argv)

    if args.export_torch:
        import json as _json
        import os as _os

        sidecar = args.export_torch.rstrip("/") + ".config.json"
        if not _os.path.exists(sidecar):
            p.error(f"no config sidecar at {sidecar}")
        with open(sidecar) as f:
            cfg = SvolConfig.from_dict(_json.load(f))
        out = args.out if args.out != "./save" else "./exported_model.pth"
        path = export_torch_checkpoint(cfg, args.export_torch, out)
        print(f"wrote reference-format torch checkpoint: {path}")
        return

    cfg = SvolConfig()
    cfg.model.backbone = args.backbone
    if args.reference_ckpt:
        path = build_reference_checkpoint(
            cfg, args.reference_ckpt, args.out, args.name or "reference_port"
        )
    else:
        if not (args.video_ckpt and args.sketch_ckpt):
            p.error("--video_ckpt/--sketch_ckpt required without --reference_ckpt")
        path = build_pretrained_checkpoint(
            cfg, args.video_ckpt, args.sketch_ckpt, args.out,
            args.name or "pretrained_init"
        )
    print(f"wrote ported checkpoint: {path}")


def load_backbone_weights(variables, backbone: str,
                          video_ckpt: str = "", sketch_ckpt: str = "",
                          stem: str = "conv7"):
    """Graft converted backbone weights into a full model's variables.

    ``variables`` is the tree from ``model.init``; returns an updated copy.
    The video/sketch sub-backbones live under
    params/backbone/{video_backbone, sketch_backbone} (models/backbone.py).
    """
    import flax

    variables = flax.core.unfreeze(variables)
    if "resnet" in backbone:
        convert_video = lambda sd: convert_resnet34(sd, stem=stem)
        convert_sketch = lambda sd: convert_resnet18(sd, stem=stem)
    else:
        convert_video = convert_sketch = convert_hf_vit

    for name, ckpt, conv in (
        ("video_backbone", video_ckpt, convert_video),
        ("sketch_backbone", sketch_ckpt, convert_sketch),
    ):
        if not ckpt:
            continue
        converted = conv(ckpt)
        variables["params"]["backbone"][name] = converted["params"]
        if "batch_stats" in converted and "batch_stats" in variables:
            variables["batch_stats"]["backbone"][name] = converted["batch_stats"]
    return variables


if __name__ == "__main__":
    main()
