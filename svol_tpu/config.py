"""Configuration for svol_tpu.

Mirrors the reference's CLI surface (``lib/configs.py:7-183``) but as explicit
dataclasses with no import-time side effects.  Every reference flag has a
field here; fields the reference *used but never defined* (``enc_layers``,
``dec_layers`` needed by ``transformer.py:318-319``; ``mode``/``feat_dim``
needed by ``sketch_detr.py:126-127``) are added with sane defaults so the
secondary heads are actually buildable.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional


@dataclass
class DataConfig:
    """Dataset / input-pipeline options (reference: configs.py:8-16, 91-108)."""

    root: str = "data/svol"
    anno_root: str = "data/svol/annos"
    video_dataset: str = "imagenet_vid"
    sketch_dataset: str = "sketchy"  # sketchy | tu_berlin | quickdraw
    bs: int = 16
    eval_bs: int = 16
    num_workers: int = 4
    num_frames: int = 32
    num_input_sketches: int = 1
    tight_frame_sampling: bool = False
    zeroshot_dataset_eval: bool = False
    zeroshot_category_eval: bool = False
    unified_sketch_dataset: bool = False
    image_size: int = 224
    # Static-shape cap on boxes per frame; equals num_queries_per_frame in the
    # reference protocol (configs.py:125-126).
    max_boxes_per_frame: int = 10
    # Grain pipeline options (no reference equivalent; the reference uses
    # torch DataLoader workers, svol_dataloader.py:59).
    prefetch_buffer: int = 2
    hflip_prob: float = 0.5
    # flip compat (see data/dataset.py module docstring): the reference flips
    # frames per-frame independently and never flips boxes; defaults here fix
    # both, the flags below restore reference behavior for strict comparisons
    flip_boxes: bool = True
    per_frame_flip: bool = False
    # auto = grain worker processes for train, threads for eval;
    # 'threads' avoids process spawn on constrained hosts.
    loader_backend: str = "auto"


@dataclass
class ModelConfig:
    """Model architecture options (reference: configs.py:110-144)."""

    sketch_head: str = "svanet"  # svanet | sketch_detr | svanet_variant
    backbone: str = "resnet"  # resnet | vit
    hidden_dim: int = 256
    nheads: int = 8
    num_layers: int = 2  # recipe default (train_quickdraw.sh:24); configs.py default is 4
    num_queries: int = 320
    num_queries_per_frame: int = 10
    input_dropout: float = 0.4
    use_sketch_pos: bool = True
    n_input_proj: int = 2
    dropout: float = 0.1
    dim_feedforward: int = 1024
    # The cross-modal transformer hard-codes 2048 (cross_modal_transformer.py:201).
    cmt_dim_feedforward: int = 2048
    pre_norm: bool = False
    sketch_position_embedding: str = "sine"  # trainable | sine | learned
    video_position_embedding: str = "sine"
    aux_loss: bool = True
    num_classes: int = 2  # foreground / background
    # Fields the reference needs but never defines (SURVEY.md §2 defects):
    enc_layers: int = 2  # vanilla DETR encoder depth (sketch_detr path)
    dec_layers: int = 2  # vanilla DETR decoder depth (sketch_detr path)
    sketch_detr_num_queries: int = 100  # per-frame queries (sketch_detr.py:129)
    variant_mode: str = "concat_to_seq"  # svanet_variants fusion mode
    # Backbone-derived feature dims; populated by build_backbone just like the
    # reference mutates args (backbone.py:124-125,140-141).
    input_vid_dim: int = 512
    input_skch_dim: int = 512
    # TPU-specific:
    use_pallas_attention: bool = False  # fused gated cross-attention kernel
    # fused VMEM-softmax self-attention (ops/pallas/flash_attention.py):
    # exact f32 softmax, logits never touch HBM; applies to the unmasked
    # video/query self-attention blocks. Default ON — measured +5% end-to-end
    # AND more precise than the bf16-softmax XLA path (PERFORMANCE.md);
    # disable with --no_flash_attention
    use_flash_attention: bool = True
    # int8 serving path: backbone convs run on the MXU's 2x-rate int8 units
    # (dynamic per-tensor activation scales, per-channel weight scales —
    # ops/quant.py). Inference-only: train=True silently keeps float convs.
    # None | 'int8'
    quantize: Optional[str] = None
    # with quantize='int8': also run the flash self-attention QK/PV matmuls
    # on the int8 units (head_dim 32 quarters the bf16 MXU; int8 halves that
    # penalty — ops/pallas/flash_attention.py int8 variant).
    # TP interaction: the fused flash kernels are custom calls XLA cannot
    # partition on its own, but under tp_devices>1 the exact kernel runs
    # PER-SHARD via shard_map over the 'model' axis (parallel/mesh.py::
    # shard_map_attention_heads — each device's local heads are a complete
    # attention problem), so use_flash_attention keeps working under TP.
    # The genuine einsum fallback is tp>1 combined with sp>1 (sequence
    # parallelism shards the L rows the kernel must see whole).
    # quantize_attention stays a single-chip/DP serving configuration; its
    # calibrated attention amax values are unused under TP.
    quantize_attention: bool = False
    # Mixture-of-Experts FFN (models/moe.py): replace the cross-modal
    # transformer's dense MLPs with Switch-style top-1 routed expert MLPs.
    # 0/1 = dense (reference parity). Shards over the 'expert' mesh axis
    # (--ep_devices); capability beyond the reference (dense-FFN only).
    moe_experts: int = 0
    # Per-expert token buffer = ceil(capacity_factor * tokens / experts);
    # overflow tokens skip the MoE (the residual carries them).
    moe_capacity_factor: float = 1.25
    # Weight of the Switch load-balancing auxiliary loss in the objective.
    moe_aux_weight: float = 0.01
    # TPU stem: 'space_to_depth' is the mathematically-equivalent MXU-friendly
    # rearrangement of the 7x7/s2 entry conv (models/resnet.py); checkpoints
    # convert losslessly between the two (utils/torch_port.py)
    resnet_stem: str = "conv7"  # conv7 | space_to_depth
    # Activation rematerialization (jax.checkpoint / nn.remat): recompute
    # block/layer activations in the backward pass instead of stashing them
    # in HBM — the standard TPU FLOPs-for-memory trade that buys batch size
    # / clip length. 'backbone' remats every ResNet block (or ViT encoder
    # layer), 'transformer' the cross-modal transformer layers, 'full' both.
    # Math-identical to 'none' (tests/test_remat.py); param tree unchanged,
    # so checkpoints are oblivious to it.
    remat: str = "none"  # none | backbone | transformer | full
    compute_dtype: str = "bfloat16"  # activations dtype under jit
    param_dtype: str = "float32"


@dataclass
class LossConfig:
    """Matcher / criterion options (reference: configs.py:147-160)."""

    matcher: str = "per_frame_matcher"  # per_frame_matcher | video_matcher
    set_cost_bbox: float = 5.0
    set_cost_giou: float = 1.0
    set_cost_class: float = 2.0
    eos_coef: float = 0.1
    aux_loss: bool = True
    # on_device: exact JAX Hungarian inside jit; callback: scipy via pure_callback
    hungarian_impl: str = "on_device"
    # solve final+aux matching as ONE wide vmapped LSAP (halves matching
    # time; opt-in — crashed this environment's tunneled TPU worker when
    # fused into the train step, see PERFORMANCE.md + scripts/repro_wide_matcher.py)
    merged_matcher: bool = False


@dataclass
class TrainConfig:
    """Optimization / loop options (reference: configs.py:17-38, 64-88)."""

    seed: int = 1
    log_interval: int = 100
    val_interval: int = 1000
    save_interval: int = -1
    debug: bool = False
    eval_untrained: bool = False
    log_dir: str = "logs"
    checkpoint: str = "./save"
    results_dir: str = "results"
    resume: Optional[str] = None
    resume_all: bool = False
    # Sparse upcycling (models/moe.py): treat --resume's checkpoint as a
    # DENSE model and convert it into this config's MoE layout — every
    # expert starts as a copy of the dense MLP, routers init fresh.
    # Weights-only (optimizer state shapes differ); needs moe_experts > 1.
    moe_upcycle: bool = False
    # Async checkpoint saves (train/checkpoints.py): orbax snapshots the
    # state to host and commits the directory on a background thread, so
    # the train loop never blocks on checkpoint IO (saves serialize against
    # each other; the CLI drains pending writes before exit).
    async_checkpoint: bool = False
    # Global-norm gradient clipping (optax.clip_by_global_norm); 0.0 = off,
    # exactly the reference's (clip-free) recipe. DETR-family training
    # commonly clips at 0.1; exposed for derived recipes.
    grad_clip_norm: float = 0.0
    # Exponential moving average of the params (train/steps.py::_update_ema):
    # ema <- d*ema + (1-d)*params each step; validation, checkpoint
    # selection, and export then use the averaged weights
    # (train/state.py::ema_eval_view). 0.0 = off (the reference has no EMA).
    ema_decay: float = 0.0
    start_iter: Optional[int] = None
    num_iters: int = 50_000
    early_stop_patience: int = 10
    lr: float = 1e-4
    lr_drop_step: int = 20_000
    wd: float = 1e-4
    optimizer: str = "adamw"  # sgd | adam | adamw
    scheduler: str = "steplr"  # steplr | multisteplr
    freeze_backbone: bool = False
    # bf16 train step (replaces apex AMP opt-level, configs.py:52-56)
    use_bf16: bool = True
    # TOTAL mesh device budget across ALL axes (-1 = all visible devices);
    # the data-parallel size is dp_devices / (sp_devices * tp_devices). The
    # name is kept for historical CLI compatibility — read it as the device
    # budget, not the data-axis size (ADVICE r3).
    dp_devices: int = -1
    # 'seq' mesh axis: frame/sequence parallelism — video tokens (and the
    # self-attention over them) shard across devices (parallel/mesh.py).
    sp_devices: int = 1
    # 'model' mesh axis: tensor parallelism — attention/MLP kernels shard in
    # the Megatron layout (parallel/mesh.py::param_partition_spec). Must
    # divide nheads and the FFN widths. Data-parallel size becomes
    # total / (sp_devices * tp_devices).
    tp_devices: int = 1
    # 'pipe' mesh axis: GPipe pipeline parallelism — the cross-modal
    # transformer's stacked layers shard stage-wise and microbatches rotate
    # through them (parallel/pipeline.py). Must divide num_layers; requires
    # sp_devices == tp_devices == 1 (the in-layer seq/model constraints are
    # formulated per-stage, not per-buffer) and the svanet head.
    pp_devices: int = 1
    # 'expert' mesh axis: expert parallelism — the MoE FFN's experts
    # (--moe_experts, models/moe.py) shard across devices; dispatch/combine
    # become an all-to-all (parallel/mesh.py::shard_expert_tokens). Must
    # divide moe_experts. Data-parallel size becomes
    # total / (sp * tp * pp * ep).
    ep_devices: int = 1
    # Microbatches per batch for pipeline parallelism (0 = num_layers, the
    # minimum that fills every stage). More microbatches shrink the GPipe
    # bubble (S-1)/(M+S-1) at the cost of smaller per-stage matmuls; must
    # divide bs.
    pp_microbatches: int = 0
    # Write a jax.profiler trace of the first profiled steps to log_dir.
    profile: bool = False
    # On-device fast validation (evaluate/device.py): mIoU@R1 drives
    # checkpoint selection / early stopping each val_interval; the full host
    # suite (AP + JSONL) runs only on new bests and at the end of training.
    fast_val: bool = False
    # Optimizer steps per jit dispatch (train/steps.py::make_multi_train_step):
    # N>1 scans N stacked batches inside ONE program, amortizing the per-
    # dispatch launch latency N-fold. Math-identical to N single dispatches
    # (tests/test_train_loop.py). log/val/save intervals and num_iters must
    # be divisible by N so boundary actions land between dispatch groups.
    steps_per_dispatch: int = 1
    # Gradient accumulation (train/steps.py::make_accum_train_step): each
    # iteration takes ONE optimizer step from the mean of K micro-batch
    # gradients (each micro-batch is --bs examples -> effective batch
    # bs*K), with only one micro-batch's activations live at a time.
    # DDP-rank semantics (per-micro loss normalization / dropout / BN).
    # Mutually exclusive with steps_per_dispatch>1.
    accum_steps: int = 1
    # ZeRO stage 1 (parallel/mesh.py::zero_partition_spec): optimizer
    # moments (adam mu/nu, sgd trace) shard over the 'data' mesh axis —
    # removes (dp-1)/dp of the optimizer-state HBM per device while params
    # stay replicated and the step stays math-identical
    # (tests/test_zero_opt.py). The reference's DDP replicates optimizer
    # state on every rank (train.py:94-99).
    zero_opt: bool = False
    # ZeRO-3 / FSDP (parallel/mesh.py::fsdp_partition_spec): parameters AND
    # optimizer moments shard over the 'data' mesh axis — each rank holds a
    # disjoint 1/dp slice of all state; GSPMD inserts the per-layer weight
    # all-gathers and gradient reduce-scatters. Supersedes zero_opt.
    # Math-identical to pure DP (tests/test_fsdp.py).
    fsdp: bool = False


@dataclass
class EvalConfig:
    """Evaluation options (reference: configs.py:163-168)."""

    bbox_type: str = "cxcywh"  # cxcywh | xyxy
    no_sort_results: bool = False
    ap_num_workers: int = 8
    ap_chunksize: int = 50
    # static-scale int8: collect per-conv activation scales from this many
    # eval batches before the run (0 = dynamic scales; needs --quantize int8)
    calibration_batches: int = 0


@dataclass
class SvolConfig:
    """Top-level config bundle."""

    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)

    def __post_init__(self) -> None:
        self.validate()

    def validate(self) -> None:
        m, d = self.model, self.data
        if m.num_queries != d.num_frames * m.num_queries_per_frame:
            raise ValueError(
                f"num_queries ({m.num_queries}) must equal num_frames "
                f"({d.num_frames}) * num_queries_per_frame ({m.num_queries_per_frame}); "
                "the reference asserts the same (matcher.py:56)."
            )
        if m.sketch_head not in ("svanet", "sketch_detr", "svanet_variant"):
            raise ValueError(f"unknown sketch_head {m.sketch_head!r}")
        if m.backbone not in ("resnet", "vit"):
            raise ValueError(f"unknown backbone {m.backbone!r}")
        if m.quantize in ("", "none", "None"):
            m.quantize = None
        if m.quantize not in (None, "int8"):
            raise ValueError(f"unknown quantize mode {m.quantize!r}")
        if m.quantize and m.backbone != "resnet":
            raise ValueError("--quantize supports ResNet backbones only")
        if d.max_boxes_per_frame != m.num_queries_per_frame:
            raise ValueError(
                "max_boxes_per_frame must equal num_queries_per_frame "
                "(per-frame LSAP is square after densification)"
            )
        tp = self.train.tp_devices
        if tp > 1:
            for nm, val in (
                ("nheads", m.nheads),
                ("hidden_dim", m.hidden_dim),
                ("cmt_dim_feedforward", m.cmt_dim_feedforward),
                ("dim_feedforward", m.dim_feedforward),
            ):
                if val % tp:
                    raise ValueError(
                        f"tp_devices ({tp}) must divide {nm} ({val}) — the "
                        "'model' mesh axis shards heads and FFN features"
                    )
        pp = self.train.pp_devices
        if pp > 1:
            if m.sketch_head != "svanet":
                raise ValueError("pp_devices > 1 supports the svanet head "
                                 "only (parallel/pipeline.py)")
            if m.num_layers % pp:
                raise ValueError(
                    f"pp_devices ({pp}) must divide num_layers "
                    f"({m.num_layers}) — the 'pipe' mesh axis shards the "
                    "transformer's stage axis")
            if self.train.sp_devices > 1 or self.train.tp_devices > 1:
                raise ValueError(
                    "pp_devices > 1 requires sp_devices == tp_devices == 1: "
                    "the in-layer seq/model sharding constraints are "
                    "formulated per-example, not per-stage-buffer "
                    "(parallel/pipeline.py)")
            if m.moe_experts > 1:
                raise ValueError(
                    "pp_devices > 1 is incompatible with moe_experts > 1: "
                    "the pipeline's stacked-stage partition rule takes the "
                    "whole transformer subtree (parallel/mesh.py::"
                    "param_partition_spec), so expert params could not also "
                    "shard over 'expert'")
            mb = self.train.pp_microbatches or m.num_layers
            if d.bs % mb:
                raise ValueError(
                    f"bs ({d.bs}) must be divisible by "
                    f"pp_microbatches ({mb})")
        if self.train.pp_microbatches < 0:
            raise ValueError("pp_microbatches must be >= 0")
        if m.moe_experts < 0:
            raise ValueError("moe_experts must be >= 0")
        if m.moe_experts > 1 and m.sketch_head != "svanet":
            raise ValueError(
                "moe_experts > 1 supports the svanet head only — the MoE "
                "FFN is wired into the cross-modal transformer "
                "(models/moe.py)")
        ep = self.train.ep_devices
        if ep < 1:
            raise ValueError("ep_devices must be >= 1")
        if ep > 1:
            if m.moe_experts <= 1:
                raise ValueError(
                    "ep_devices > 1 requires moe_experts > 1 — the 'expert' "
                    "mesh axis shards the MoE FFN's experts (models/moe.py)")
            if m.moe_experts % ep:
                raise ValueError(
                    f"ep_devices ({ep}) must divide moe_experts "
                    f"({m.moe_experts}) — each device holds "
                    "moe_experts/ep_devices experts")
        if m.remat not in ("none", "backbone", "transformer", "full"):
            raise ValueError(
                f"remat must be one of none|backbone|transformer|full, "
                f"got {m.remat!r}")
        if m.remat in ("transformer", "full") and m.sketch_head != "svanet":
            raise ValueError(
                "remat=transformer/full supports the svanet head only — the "
                "remat boundary is wired into the cross-modal transformer "
                "(use remat=backbone with other heads)")
        if self.train.grad_clip_norm < 0:
            raise ValueError("grad_clip_norm must be >= 0 (0 = off)")
        if not (0.0 <= self.train.ema_decay < 1.0):
            raise ValueError("ema_decay must be in [0, 1) (0 = off)")
        if self.train.accum_steps < 1:
            raise ValueError("accum_steps must be >= 1")
        n = self.train.steps_per_dispatch
        if n < 1:
            raise ValueError("steps_per_dispatch must be >= 1")
        if n > 1 and self.train.accum_steps > 1:
            raise ValueError(
                "steps_per_dispatch and accum_steps are mutually exclusive "
                "(both restructure the per-dispatch batch stacking)"
            )
        if n > 1:
            intervals = {
                "log_interval": self.train.log_interval,
                "val_interval": self.train.val_interval,
                "num_iters": self.train.num_iters,
            }
            if self.train.save_interval > 0:
                intervals["save_interval"] = self.train.save_interval
            for name, v in intervals.items():
                if v % n:
                    raise ValueError(
                        f"{name} ({v}) must be divisible by "
                        f"steps_per_dispatch ({n}) so logging/validation/"
                        "checkpoint boundaries land between dispatch groups"
                    )

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "SvolConfig":
        return cls(
            data=DataConfig(**d.get("data", {})),
            model=ModelConfig(**d.get("model", {})),
            loss=LossConfig(**d.get("loss", {})),
            train=TrainConfig(**d.get("train", {})),
            eval=EvalConfig(**d.get("eval", {})),
        )

    def run_tag(self, phase: str = "") -> str:
        """Checkpoint/results name encoding the config, matching the
        reference filename scheme (train.py:280-282, test.py:197-199)."""
        m, d, l = self.model, self.data, self.loss

        def _fmt(x: float) -> str:
            return str(int(x)) if float(x).is_integer() else str(x)

        tag = (
            f"{d.video_dataset}_{d.sketch_dataset}_{m.sketch_head}_{m.backbone}_"
            f"{m.num_layers}l_{d.num_frames}f_{m.num_queries}q_"
            f"{_fmt(l.set_cost_bbox)}_{_fmt(l.set_cost_giou)}_{_fmt(l.set_cost_class)}"
        )
        return f"{tag}_{phase}" if phase else tag


# ---------------------------------------------------------------------------
# CLI bridge: same flag names as the reference parser (lib/configs.py) so the
# shell recipes port 1:1, but parsing happens only when explicitly requested.
# ---------------------------------------------------------------------------

_FLAG_MAP = {
    # flag name -> (section, field)
    "root": ("data", "root"),
    "anno_root": ("data", "anno_root"),
    "video_dataset": ("data", "video_dataset"),
    "sketch_dataset": ("data", "sketch_dataset"),
    "bs": ("data", "bs"),
    "eval_bs": ("data", "eval_bs"),
    "num_workers": ("data", "num_workers"),
    "num_frames": ("data", "num_frames"),
    "num_input_sketches": ("data", "num_input_sketches"),
    "image_size": ("data", "image_size"),
    "loader_backend": ("data", "loader_backend"),
    "tight_frame_sampling": ("data", "tight_frame_sampling"),
    "zeroshot_dataset_eval": ("data", "zeroshot_dataset_eval"),
    "zeroshot_category_eval": ("data", "zeroshot_category_eval"),
    "unified_sketch_dataset": ("data", "unified_sketch_dataset"),
    "per_frame_flip": ("data", "per_frame_flip"),
    "sketch_head": ("model", "sketch_head"),
    "backbone": ("model", "backbone"),
    "hidden_dim": ("model", "hidden_dim"),
    "nheads": ("model", "nheads"),
    "num_layers": ("model", "num_layers"),
    "num_queries": ("model", "num_queries"),
    "num_queries_per_frame": ("model", "num_queries_per_frame"),
    "input_dropout": ("model", "input_dropout"),
    "use_sketch_pos": ("model", "use_sketch_pos"),
    "n_input_proj": ("model", "n_input_proj"),
    "dropout": ("model", "dropout"),
    "dim_feedforward": ("model", "dim_feedforward"),
    "cmt_dim_feedforward": ("model", "cmt_dim_feedforward"),
    "pre_norm": ("model", "pre_norm"),
    "sketch_position_embedding": ("model", "sketch_position_embedding"),
    "video_position_embedding": ("model", "video_position_embedding"),
    "enc_layers": ("model", "enc_layers"),
    "dec_layers": ("model", "dec_layers"),
    "use_pallas_attention": ("model", "use_pallas_attention"),
    "use_flash_attention": ("model", "use_flash_attention"),
    "quantize": ("model", "quantize"),
    "quantize_attention": ("model", "quantize_attention"),
    "resnet_stem": ("model", "resnet_stem"),
    "remat": ("model", "remat"),
    "compute_dtype": ("model", "compute_dtype"),
    "moe_experts": ("model", "moe_experts"),
    "moe_capacity_factor": ("model", "moe_capacity_factor"),
    "moe_aux_weight": ("model", "moe_aux_weight"),
    "matcher": ("loss", "matcher"),
    "merged_matcher": ("loss", "merged_matcher"),
    "set_cost_bbox": ("loss", "set_cost_bbox"),
    "set_cost_giou": ("loss", "set_cost_giou"),
    "set_cost_class": ("loss", "set_cost_class"),
    "eos_coef": ("loss", "eos_coef"),
    "seed": ("train", "seed"),
    "log_interval": ("train", "log_interval"),
    "val_interval": ("train", "val_interval"),
    "save_interval": ("train", "save_interval"),
    "debug": ("train", "debug"),
    "eval_untrained": ("train", "eval_untrained"),
    "log_dir": ("train", "log_dir"),
    "checkpoint": ("train", "checkpoint"),
    "results_dir": ("train", "results_dir"),
    "resume": ("train", "resume"),
    "resume_all": ("train", "resume_all"),
    "moe_upcycle": ("train", "moe_upcycle"),
    "async_checkpoint": ("train", "async_checkpoint"),
    "grad_clip_norm": ("train", "grad_clip_norm"),
    "ema_decay": ("train", "ema_decay"),
    "start_iter": ("train", "start_iter"),
    "num_iters": ("train", "num_iters"),
    "early_stop_patience": ("train", "early_stop_patience"),
    "lr": ("train", "lr"),
    "lr_drop_step": ("train", "lr_drop_step"),
    "wd": ("train", "wd"),
    "optimizer": ("train", "optimizer"),
    "scheduler": ("train", "scheduler"),
    "freeze_backbone": ("train", "freeze_backbone"),
    "profile": ("train", "profile"),
    "fast_val": ("train", "fast_val"),
    "dp_devices": ("train", "dp_devices"),
    "sp_devices": ("train", "sp_devices"),
    "tp_devices": ("train", "tp_devices"),
    "pp_devices": ("train", "pp_devices"),
    "ep_devices": ("train", "ep_devices"),
    "pp_microbatches": ("train", "pp_microbatches"),
    "steps_per_dispatch": ("train", "steps_per_dispatch"),
    "accum_steps": ("train", "accum_steps"),
    "zero_opt": ("train", "zero_opt"),
    "fsdp": ("train", "fsdp"),
    "bbox_type": ("eval", "bbox_type"),
    "no_sort_results": ("eval", "no_sort_results"),
    "calibration_batches": ("eval", "calibration_batches"),
}

_BOOL_STORE_TRUE = {
    "tight_frame_sampling", "zeroshot_dataset_eval", "zeroshot_category_eval",
    "unified_sketch_dataset", "per_frame_flip", "pre_norm", "debug",
    "eval_untrained",
    "resume_all", "freeze_backbone", "no_sort_results", "use_pallas_attention",
    "use_flash_attention", "quantize_attention", "profile", "merged_matcher",
    "fast_val", "zero_opt", "fsdp", "moe_upcycle", "async_checkpoint",
}


# Reference flags that are torch/CUDA-specific or superseded here; accepted
# and ignored so the reference's shell recipes run unmodified
# (configs.py:25-26,39-61,98-107,171-177). bf16 replaces AMP; Mesh DP
# replaces NCCL/DDP; BatchNorm syncs automatically under sharded jit;
# metrics.jsonl replaces Neptune.
_LEGACY_IGNORED_STORE_TRUE = [
    "no_gpu", "use_neptune", "sync_bn", "no_pin_memory", "use_vis_mean",
]
_LEGACY_IGNORED_VALUED = [
    "dist-backend", "opt-level", "keep-batchnorm-fp32", "loss-scale",
    "use_amp", "channels-last", "aspect_ratio_grouping", "vis_mode",
    "n_neighbor",
]


def build_arg_parser() -> argparse.ArgumentParser:
    """Argparse parser mirroring the reference CLI (lib/configs.py:7-178)."""
    defaults = SvolConfig()
    p = argparse.ArgumentParser(description="svol_tpu: sketch-based video object localization")
    for flag, (section, fname) in _FLAG_MAP.items():
        default = getattr(getattr(defaults, section), fname)
        if flag in _BOOL_STORE_TRUE:
            p.add_argument(f"--{flag}", action="store_true", default=default)
        elif flag in ("resume", "start_iter", "quantize"):
            typ = int if flag == "start_iter" else str
            p.add_argument(f"--{flag}", type=typ, default=default)
        else:
            p.add_argument(f"--{flag}", type=type(default), default=default)
    # negative-flag aliases matching the reference exactly
    p.add_argument("--no_aux_loss", dest="aux_loss", action="store_false", default=True)
    p.add_argument("--no_flip_boxes", dest="flip_boxes", action="store_false",
                   default=True,
                   help="reference-compat: do NOT flip target boxes with frames")
    p.add_argument("--no_flash_attention", dest="use_flash_attention",
                   action="store_false", default=True,
                   help="disable the fused VMEM-softmax self-attention kernel")
    # ablation-mode alias: the reference selects fusion variants via --mode
    # (svanet_variants.py:298, never defined in its configs.py)
    p.add_argument("--mode", dest="variant_mode",
                   default=defaults.model.variant_mode)
    for flag in _LEGACY_IGNORED_STORE_TRUE:
        p.add_argument(f"--{flag}", action="store_true", help="ignored (torch-era flag)")
    for flag in _LEGACY_IGNORED_VALUED:
        p.add_argument(f"--{flag}", default=None, help="ignored (torch-era flag)")
    return p


def config_from_args(argv: Optional[List[str]] = None) -> SvolConfig:
    """Parse CLI flags into a SvolConfig (no global state)."""
    args = build_arg_parser().parse_args(argv)
    cfg = SvolConfig()
    for flag, (section, fname) in _FLAG_MAP.items():
        setattr(getattr(cfg, section), fname, getattr(args, flag))
    cfg.loss.aux_loss = args.aux_loss
    cfg.model.aux_loss = args.aux_loss
    cfg.data.flip_boxes = args.flip_boxes
    cfg.model.variant_mode = args.variant_mode
    cfg.data.max_boxes_per_frame = cfg.model.num_queries_per_frame
    cfg.validate()
    return cfg


def config_to_markdown(cfg: SvolConfig, max_str_len: int = 120) -> str:
    """Markdown table of the flattened config, like the reference's rank-0
    dump (configs.py:181-183, misc.py:226)."""
    rows = []
    for section_name in ("data", "model", "loss", "train", "eval"):
        section = getattr(cfg, section_name)
        for f in dataclasses.fields(section):
            v = str(getattr(section, f.name))
            if len(v) > max_str_len:
                v = v[:max_str_len] + "..."
            rows.append(f"| {section_name}.{f.name} | {v} |")
    return "\n".join(["| key | value |", "|---|---|"] + rows)
