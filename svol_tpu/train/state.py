"""Train state, optimizer, and LR schedules.

Replaces the reference's torch optimizer/scheduler/apex-AMP setup
(train.py:94-143) with optax + a bf16 compute policy:
  * optimizers: sgd (momentum 0.9) / adam / adamw, weight decay as in
    train.py:94-99
  * schedules: 'steplr' multiplies lr by 0.1 every lr_drop_step iterations
    (torch StepLR semantics, train.py:131); 'multisteplr' drops once at
    lr_drop_step (train.py:133)
  * mixed precision: parameters and optimizer state stay float32; the model
    computes in bfloat16 (ModelConfig.compute_dtype). No loss scaling is
    needed on TPU — bf16 has fp32's exponent range, unlike the fp16 apex AMP
    path the reference configures (configs.py:52-56).
"""
from __future__ import annotations

from typing import Any, Callable, Dict

import flax
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from svol_tpu.config import SvolConfig


class TrainState(train_state.TrainState):
    """flax TrainState + BatchNorm running statistics (ResNet backbone)
    + an optional EMA shadow of the params (--ema_decay; None when off,
    which keeps the pytree — and every checkpoint — identical to an
    EMA-free state)."""

    batch_stats: Any = None
    ema_params: Any = None


def make_lr_schedule(config: SvolConfig) -> Callable[[jnp.ndarray], jnp.ndarray]:
    t = config.train
    base, drop = t.lr, max(1, t.lr_drop_step)
    if t.scheduler == "steplr":
        def sched(step):
            return base * jnp.power(0.1, jnp.floor(step / drop))
    elif t.scheduler == "multisteplr":
        def sched(step):
            return jnp.where(step < drop, base, base * 0.1)
    else:
        raise NotImplementedError(t.scheduler)
    return sched


def make_optimizer(config: SvolConfig) -> optax.GradientTransformation:
    t = config.train
    clip = t.grad_clip_norm

    if t.scheduler == "reducelronplateau":
        # host-driven LR: exposed as a mutable hyperparam, decayed by the
        # train loop on validation-metric plateau (torch ReduceLROnPlateau
        # semantics, train.py:134-143)
        if t.optimizer != "adamw":
            raise NotImplementedError("reducelronplateau supports adamw only")

        def _adamw(learning_rate):
            # the clip lives INSIDE the injected factory so the
            # InjectHyperparamsState (and its mutable learning_rate —
            # reduce_lr_on_plateau/current_lr) stays the outermost state
            inner = optax.adamw(learning_rate, weight_decay=t.wd)
            if clip > 0:
                inner = optax.chain(optax.clip_by_global_norm(clip), inner)
            return inner

        return optax.inject_hyperparams(_adamw)(learning_rate=t.lr)
    sched = make_lr_schedule(config)
    if t.optimizer == "adamw":
        tx = optax.adamw(sched, weight_decay=t.wd)
    elif t.optimizer == "adam":
        # torch Adam's weight_decay is L2 added to the gradient
        tx = optax.chain(
            optax.add_decayed_weights(t.wd), optax.adam(sched)
        )
    elif t.optimizer == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(t.wd), optax.sgd(sched, momentum=0.9)
        )
    else:
        raise NotImplementedError(t.optimizer)

    if clip > 0:
        # global-norm gradient clipping (--grad_clip_norm). Wrapped before
        # the freeze_backbone multi_transform below, so under freezing the
        # norm spans exactly the trainable partition — matching
        # torch.nn.utils.clip_grad_norm_ over params that require grad. The
        # reference recipe never clips (train.py:205-357); 0.0 (default)
        # preserves that behavior exactly.
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)

    if t.freeze_backbone:
        def label_fn(params):
            return jax.tree.map_with_path(
                lambda path, _: "frozen"
                if any(getattr(k, "key", None) == "backbone" for k in path)
                else "train",
                params,
            )

        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, label_fn
        )
    return tx


def reduce_lr_on_plateau(state: TrainState, factor: float = 0.1) -> TrainState:
    """Scale the injected learning rate (reducelronplateau scheduler)."""
    opt_state = state.opt_state
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = hp["learning_rate"] * factor
    return state.replace(opt_state=opt_state._replace(hyperparams=hp))


class PlateauTracker:
    """Host-side decision logic of torch ReduceLROnPlateau (mode='max',
    threshold_mode='rel', cooldown=0) — the reference's validation-metric
    scheduler (train.py:134-143 builds it with factor=0.1, patience=1,
    threshold=0.5).

    Keeps its OWN best (updated only when ``metric > best * (1+threshold)``),
    which is deliberately distinct from any checkpoint/early-stop best that
    ratchets on every improvement. ``step`` returns True exactly when torch
    would call ``_reduce_lr``; tests drive both with identical metric traces
    (tests/test_schedulers.py).
    """

    def __init__(self, factor: float = 0.1, patience: int = 1,
                 threshold: float = 0.5):
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.best = float("-inf")  # torch mode_worse for mode='max'
        self.num_bad = 0

    def step(self, metric: float) -> bool:
        if metric > self.best * (1.0 + self.threshold):
            self.best = metric
            self.num_bad = 0
            return False
        self.num_bad += 1
        if self.num_bad > self.patience:
            self.num_bad = 0
            return True
        return False


def current_lr(state: TrainState) -> float:
    return float(state.opt_state.hyperparams["learning_rate"])


def init_sample_batch(config: SvolConfig, batch_size: int = 0,
                      data_axis_size: int = 1):
    """Shape-only batch for ``model.init`` — flax init is shape-driven, so
    zero pixels + all-valid masks produce the same param tree as a real
    batch, without pulling (and thereby advancing) the training stream.
    The default batch size is the smallest the model will trace: 1, except
    under pipeline parallelism where the GPipe branch runs
    ``microbatch_split`` AND ``shard_pipeline_stages`` during init too, so
    the batch must be M × data_axis_size with M the effective
    ``pp_microbatches`` (0 resolves to ``num_layers``, the same rule as
    models/cross_modal_transformer.py) — each microbatch's rows shard over
    the 'data' mesh axis. Keeping init tiny matters: full-batch init took
    ~500 s through the TPU tunnel (CLAUDE.md)."""
    import numpy as np

    if batch_size <= 0:
        batch_size = 1
        if config.train.pp_devices > 1:
            mb = (config.train.pp_microbatches
                  or config.model.num_layers)
            batch_size = mb * max(data_axis_size, 1)

    d = config.data
    s = d.image_size
    return {
        "src_sketch": np.zeros((batch_size, 1, s, s, 3), np.uint8),
        "src_video": np.zeros((batch_size, d.num_frames, s, s, 3), np.uint8),
        "src_sketch_mask": np.ones((batch_size, 1), np.float32),
        "src_video_mask": np.ones((batch_size, d.num_frames), np.float32),
    }


def create_train_state(
    config: SvolConfig,
    model,
    rng: jax.Array,
    sample_batch: Dict[str, jnp.ndarray],
) -> TrainState:
    variables = model.init(
        rng,
        src_sketch=sample_batch["src_sketch"],
        src_video=sample_batch["src_video"],
        src_sketch_mask=sample_batch["src_sketch_mask"],
        src_video_mask=sample_batch["src_video_mask"],
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", flax.core.freeze({}))
    return TrainState.create(
        apply_fn=model.apply,
        params=params,
        tx=make_optimizer(config),
        batch_stats=batch_stats,
        # EMA shadow starts AT the params (standard init: the average of a
        # length-0 history is the current point). MUST be distinct buffers,
        # not an alias of params: the donated train step would otherwise
        # hand XLA the same buffer twice ("Attempt to donate the same
        # buffer twice in Execute()").
        ema_params=(jax.tree.map(jnp.array, params)
                    if config.train.ema_decay > 0 else None),
    )


def ema_eval_view(state: TrainState) -> TrainState:
    """The state to EVALUATE/EXPORT: params swapped for their EMA shadow
    when one is maintained (--ema_decay), identity otherwise. Validation,
    checkpoint selection, and serving should all see the averaged weights —
    that is the point of the EMA."""
    if state.ema_params is None:
        return state
    return state.replace(params=state.ema_params)


def count_parameters(params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))
