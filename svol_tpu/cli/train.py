"""Training entry (functional equivalent of train.py:36-395).

Flow: mesh plan -> model/criterion/state -> grain loader (per-host sharded)
-> iteration loop of one fused jit step -> periodic validation via the
inference path -> best/periodic Orbax checkpoints -> early stopping on
SVOL-full-mIoU@R1 (train.py:297,324-352).

Differences from the reference, by design:
  * no DDP wrapper / barriers — SPMD jit over a Mesh (parallel/mesh.py)
  * no apex AMP — bf16 compute policy (train/state.py)
  * matcher+loss inside the same jit as forward/backward — no host syncs
  * phase timing meters: the fused step can't split forward/backward, so
    'model_step_time' replaces the forward/backward pair (train.py:213-235);
    dataloading/prepare meters keep their names.

Run:  python -m svol_tpu.cli.train --root ... --anno_root ... [flags]
"""
from __future__ import annotations

import pprint
import time
from collections import defaultdict
import jax

from svol_tpu.config import SvolConfig, config_from_args, config_to_markdown
from svol_tpu.cli.infer import inference
from svol_tpu.evaluate.device import fast_validation
from svol_tpu.data.pipeline import (
    ResumableIterator,
    build_loader,
    device_prefetch,
)
from svol_tpu.losses.criterion import build_criterion
from svol_tpu.models import build_model
from svol_tpu.parallel import make_mesh_plan
from svol_tpu.train.checkpoints import (
    best_checkpoint_name,
    load_loader_state,
    periodic_checkpoint_name,
    restore_checkpoint,
    save_checkpoint,
    wait_for_checkpoints,
)
from svol_tpu.train.preemption import (
    EXIT_PREEMPTED,
    PreemptionGuard,
    preempt_checkpoint_name,
)
from svol_tpu.train.state import (
    PlateauTracker,
    count_parameters,
    create_train_state,
    ema_eval_view,
    init_sample_batch,
)
from svol_tpu.train.steps import make_eval_step, make_train_step
from svol_tpu.utils import AverageMeter, cur_time, setup_logger
from svol_tpu.utils.metrics_writer import MetricsWriter
from svol_tpu.utils.profiling import maybe_trace


def train_val(config: SvolConfig, logger) -> bool:
    """Returns True if training stopped on a preemption signal (the caller
    exits EXIT_PREEMPTED so supervise/schedulers relaunch-and-resume)."""
    plan = make_mesh_plan(
        config.train.dp_devices,
        seq_axis=config.train.sp_devices,
        model_axis=config.train.tp_devices,
        pipe_axis=config.train.pp_devices,
        expert_axis=config.train.ep_devices,
        zero_opt=config.train.zero_opt,
        fsdp=config.train.fsdp,
    )
    plan.set_active()  # in-model seq/tensor-parallel constraints target this mesh
    state_note = (", fsdp (zero-3) state sharding" if plan.fsdp
                  else ", zero-1 optimizer sharding" if plan.zero_opt else "")
    logger.info(
        f"mesh: {plan.mesh} (pipe={plan.pipe_axis_size}, "
        f"data={plan.data_axis_size}, expert={plan.expert_axis_size}, "
        f"seq={plan.seq_axis_size}, model={plan.model_axis_size}"
        f"{state_note})"
    )
    if config.data.bs % plan.data_axis_size:
        raise ValueError(
            f"batch size {config.data.bs} must be divisible by the data-"
            f"parallel mesh size {plan.data_axis_size}; adjust --bs or the "
            f"total device budget (--dp_devices is the budget across ALL "
            f"mesh axes: data = dp_devices / (sp_devices * tp_devices))"
        )
    # validation runs data-parallel on the same mesh; the padded eval batch
    # must divide over the 'data' axis (cli/infer.get_results contract).
    # A silent single-device fallback here would be wrong: the plan stays
    # active and the train state stays mesh/TP-sharded, so validation would
    # trace seq/model constraints against unsharded batches — an untested
    # hybrid (ADVICE r3). infer.py's genuine fallback never activates a
    # plan; here, pad eval_bs up to the next data-axis multiple instead
    # (each val batch is already shape-padded to eval_bs, and per-example
    # losses/rows drop pad entries exactly — train/steps.py:199-226).
    if config.data.eval_bs % plan.data_axis_size:
        d = plan.data_axis_size
        padded = ((config.data.eval_bs + d - 1) // d) * d
        logger.info(
            f"eval_bs {config.data.eval_bs} is not divisible by the "
            f"{d}-way data axis; padding eval batches up to {padded}"
        )
        config.data.eval_bs = padded
    eval_plan = plan

    process_index = jax.process_index()
    process_count = jax.process_count()

    model = build_model(config)
    criterion = build_criterion(config)

    val_loader_factory = lambda: build_loader(config, "val", backend="threads")

    # shape-only init batch: the training loader is built AFTER resume (below)
    # so its stream can be positioned exactly at the restored step
    state = create_train_state(
        config, model, jax.random.PRNGKey(config.train.seed),
        init_sample_batch(config, data_axis_size=plan.data_axis_size),
    )
    state = plan.replicate(state)
    n_params = count_parameters(state.params)
    logger.info(f"model parameters: {n_params / 1e6:.2f}M")

    if config.train.resume:
        if config.train.moe_upcycle:
            # sparse upcycling: the checkpoint is a DENSE model; every MoE
            # expert starts as a copy of its dense MLP (models/moe.py)
            if config.model.moe_experts <= 1:
                raise ValueError("--moe_upcycle requires --moe_experts > 1")
            if config.train.resume_all:
                raise ValueError(
                    "--moe_upcycle is weights-only (optimizer state shapes "
                    "differ between the dense and MoE layouts); drop "
                    "--resume_all")
            from svol_tpu.train.checkpoints import restore_upcycled

            state = restore_upcycled(
                config.train.resume, state, config.model.moe_experts,
                jax.random.PRNGKey(config.train.seed),
            )
            state = plan.replicate(state)  # re-pin the converted params
            logger.info(
                f"upcycled dense checkpoint {config.train.resume} into "
                f"{config.model.moe_experts} experts")
        else:
            state = restore_checkpoint(
                config.train.resume, state, restore_all=config.train.resume_all
            )
            logger.info(f"resumed from {config.train.resume} at step {int(state.step)}")

    n_dispatch = config.train.steps_per_dispatch
    n_accum = config.train.accum_steps  # mutually exclusive (config.validate)
    if n_dispatch > 1:
        from svol_tpu.train.steps import make_multi_train_step

        train_step = make_multi_train_step(config, criterion)
    elif n_accum > 1:
        from svol_tpu.train.steps import make_accum_train_step

        train_step = make_accum_train_step(config, criterion, n_accum)
    else:
        train_step = make_train_step(config, criterion)
    eval_step = make_eval_step(config, criterion)
    rng = jax.random.PRNGKey(config.train.seed)

    time_meters = defaultdict(AverageMeter)
    loss_meters = defaultdict(AverageMeter)
    writer = MetricsWriter(config.train.log_dir) if process_index == 0 else None
    best_metric = 0.0
    early_stop_count = 0
    plateau = PlateauTracker(factor=0.1, patience=1, threshold=0.5)
    start_iter = int(state.step)
    if config.train.start_iter is not None:
        start_iter = config.train.start_iter

    # -- training stream, positioned at the starting iteration -------------
    # Exact data-stream resume (exceeds the reference, whose
    # IterationBasedBatchSampler only offsets its counter — the stream
    # restarts): a resumed run consumes the same batch sequence the
    # uninterrupted run would have. threads backend: position is a pure
    # function of the step counter (index-math fast-forward, no decode,
    # works per-host). grain backend: restore the iterator-state sidecar
    # saved next to the checkpoint (single-host; saved by rank 0).
    batches_per_iter = n_accum if n_accum > 1 else 1
    consumed_at_start = max(start_iter, 0) * batches_per_iter
    train_backend = config.data.loader_backend
    if train_backend == "auto":
        train_backend = "grain"
    loader_state = None
    skip = 0
    if consumed_at_start:
        if train_backend == "grain":
            if (config.train.resume and config.train.resume_all
                    and start_iter == int(state.step)
                    and process_count == 1):
                loader_state = load_loader_state(config.train.resume)
            if loader_state is not None:
                logger.info("resume: grain stream restored from the "
                            "checkpoint's .loader_state sidecar")
            else:
                logger.info(
                    "resume: grain stream restarts from batch 0 (reference "
                    "IterationBasedBatchSampler behavior) — exact data-"
                    "stream resume needs a single-host --resume_all with a "
                    ".loader_state sidecar, or the 'threads' loader backend")
        else:
            skip = consumed_at_start
            logger.info(f"resume: fast-forwarding the data stream by "
                        f"{skip} batches (index math, no decode)")
    train_iter = iter(build_loader(
        config, "train", shard_index=process_index, shard_count=process_count,
        skip_batches=skip, loader_state=loader_state,
    ))
    resumable = None
    if train_backend == "grain" and process_index == 0:
        # snapshot window must out-span the prefetch overshoot:
        # device_prefetch holds prefetch_buffer groups of
        # (steps_per_dispatch | accum_steps) host batches each
        depth = n_dispatch if n_dispatch > 1 else max(n_accum, 1)
        resumable = ResumableIterator(
            train_iter,
            history=8 + 2 * (config.data.prefetch_buffer + 2) * depth,
        )
        train_iter = resumable

    def loader_sidecar(iters_done: int):
        """grain stream state with exactly ``iters_done`` optimizer
        iterations' worth of batches consumed — saved alongside the
        checkpoint written at that boundary (None for non-grain backends,
        where resume recomputes the position from the step counter)."""
        if resumable is None:
            return None
        return resumable.state_after(
            (iters_done - start_iter) * batches_per_iter
        )

    if config.train.eval_untrained:
        # sanity floor: evaluate the untrained model first (train.py:187)
        metrics_out, _, _ = inference(
            config, state, eval_step, val_loader_factory(),
            f"{cur_time()}_{config.run_tag('val_untrained')}.jsonl", logger=logger,
            plan=eval_plan,
        )
        logger.info(
            f"\n>>>>> Untrained baseline\n"
            f"{pprint.pformat(metrics_out['brief'], indent=4)}\n"
        )

    # metrics stay on device between log points — fetching them every step
    # would serialize the dispatch queue (the reference syncs every step for
    # its loss all-reduce, train.py:240; we don't have to)
    pending_metrics = []

    def drain_metrics():
        import numpy as np

        for m in pending_metrics:
            for k, v in m.items():
                # multi-step dispatch returns (N,)-stacked per-step values;
                # one host fetch per key, one meter update per sub-step
                for x in np.asarray(v).reshape(-1):
                    loss_meters[k].update(float(x))
        pending_metrics.clear()

    # double-buffered device input: the NEXT batch's host->device transfer is
    # enqueued before the current step runs, so the copy overlaps compute
    # (data/pipeline.py:device_prefetch). dataloading_time absorbs any
    # residual wait; prepare_inputs_time (the reference's H2D meter,
    # train.py:217) measures only the enqueue of the following batch.
    host_iter = train_iter
    stack_n = n_dispatch if n_dispatch > 1 else n_accum
    if stack_n > 1:
        # stack N host batches on a leading axis for the scanned programs:
        # steps_per_dispatch consumes them as N optimizer steps, accum_steps
        # as N micro-batch gradients of ONE optimizer step
        if n_dispatch > 1 and max(start_iter, 0) % n_dispatch:
            raise ValueError(
                f"start iteration {start_iter} must be divisible by "
                f"steps_per_dispatch ({n_dispatch}); resume at a group "
                "boundary or set --start_iter"
            )
        import numpy as _np

        def _stacked(it, n):
            while True:
                group = [next(it) for _ in range(n)]
                yield {k: _np.stack([g[k] for g in group]) for k in group[0]}

        device_iter = device_prefetch(
            _stacked(host_iter, stack_n),
            plan.shard_stacked_batch,
            size=config.data.prefetch_buffer,
        )
    else:
        device_iter = device_prefetch(
            host_iter,
            lambda b: plan.shard_batch(dict(b)),
            size=config.data.prefetch_buffer,
        )
    # graceful preemption: first SIGTERM latches a flag (checked at the
    # step boundary below), second SIGTERM kills (train/preemption.py);
    # no-op when train_val runs off the main thread (in-process tests)
    guard = PreemptionGuard().install()
    preempted = False
    try:
        for group_start in range(
            max(start_iter, 0), config.train.num_iters, n_dispatch
        ):
            iter_i = group_start + n_dispatch - 1  # last iteration in the group
            t0 = time.time()
            device_batch = next(device_iter)
            time_meters["dataloading_time"].update(time.time() - t0)
            time_meters["prepare_inputs_time"].update(0.0)
            tictoc = time.time()

            profile_this = config.train.profile and group_start <= 10 <= iter_i
            with maybe_trace(config.train.log_dir, enabled=profile_this):
                state, metrics = train_step(state, device_batch, rng)
            pending_metrics.append(metrics)
            time_meters["model_step_time"].update(
                (time.time() - tictoc) / n_dispatch
            )

            if group_start % config.train.log_interval == 0:
                drain_metrics()
                time_stats = "\n".join(
                    f"\t> {k} {v.avg:.4f}" for k, v in time_meters.items()
                )
                loss_str = "\n".join(
                    f"\t> {k} {v.avg:.4f}" for k, v in loss_meters.items()
                )
                logger.info(
                    f"Training Logs\n[Iter] {iter_i:06d}\n"
                    f"[Time]\n{time_stats}\n[Loss]\n{loss_str}\n"
                )
                if writer:
                    writer.log(iter_i, "train",
                               {k: v.avg for k, v in loss_meters.items()})

            if (
                config.train.save_interval > 0
                and (iter_i + 1) % config.train.save_interval == 0
                and process_index == 0
            ):
                save_checkpoint(
                    config.train.checkpoint,
                    periodic_checkpoint_name(config, iter_i),
                    state, config,
                    wait=not config.train.async_checkpoint,
                    loader_state=loader_sidecar(iter_i + 1),
                )

            # guard.requested is checked BEFORE the validation block: a SIGTERM
            # that lands on a validation-boundary group must go straight to the
            # preempt save — running a full validation (plus full-host inference
            # on a new best) inside an eviction grace period risks a SIGKILL
            # before the checkpoint lands (ADVICE r4 medium).
            if not guard.requested and (
                (iter_i + 1) % config.train.val_interval == 0 or config.train.debug
            ):
                drain_metrics()
                if config.train.fast_val:
                    # on-device mIoU@R1 / R1@thd (evaluate/device.py): identical
                    # selection semantics to the host path at k=1, no JSONL
                    # assembly / AP worker pool per val_interval. The full host
                    # suite runs below only when this finds a new best (and the
                    # CLI caller runs it once at the end of training).
                    brief = fast_validation(
                        ema_eval_view(state), eval_step, val_loader_factory(),
                        config.model.num_queries_per_frame, plan=eval_plan,
                    )
                else:
                    results_filename = f"{cur_time()}_{config.run_tag('val')}.jsonl"
                    metrics_out, eval_loss_meters, _ = inference(
                        config, ema_eval_view(state), eval_step,
                        val_loader_factory(),
                        results_filename, logger=logger, plan=eval_plan,
                    )
                    brief = metrics_out["brief"]
                cur_metric = brief["SVOL-full-mIoU@R1"]
                if writer:
                    writer.log(iter_i + 1, "val",
                               {k: float(v) for k, v in brief.items()})
                logger.info(
                    f"\n>>>>> Evaluation\n[Iter] {iter_i + 1:03d}\n"
                    f"[Metrics]\n{pprint.pformat(brief, indent=4)}\n"
                )
                if config.train.scheduler == "reducelronplateau":
                    # torch ReduceLROnPlateau(mode=max, factor=.1, patience=1,
                    # threshold=.5, rel) semantics — train.py:134-143. The
                    # tracker keeps its OWN best (updated only on a >1.5x
                    # improvement), distinct from the early-stop/checkpoint
                    # best_metric below, which ratchets on any improvement.
                    from svol_tpu.train.state import reduce_lr_on_plateau

                    if plateau.step(cur_metric):
                        state = reduce_lr_on_plateau(state, plateau.factor)
                        logger.info("plateau: learning rate reduced x0.1")

                if cur_metric > best_metric:
                    early_stop_count = 0
                    best_metric = cur_metric
                    if config.train.fast_val:
                        # full host suite (AP + JSONL artifacts) only on new bests
                        metrics_out, _, _ = inference(
                            config, ema_eval_view(state), eval_step,
                            val_loader_factory(),
                            f"{cur_time()}_{config.run_tag('val')}.jsonl",
                            logger=logger, plan=eval_plan,
                        )
                        logger.info(
                            f"\n>>>>> New best (full metrics)\n"
                            f"{pprint.pformat(metrics_out['brief'], indent=4)}\n"
                        )
                    if process_index == 0:
                        save_checkpoint(
                            config.train.checkpoint,
                            best_checkpoint_name(config),
                            state, config,
                            wait=not config.train.async_checkpoint,
                            loader_state=loader_sidecar(iter_i + 1),
                        )
                else:
                    early_stop_count += 1
                    if (
                        config.train.early_stop_patience > 0
                        and early_stop_count > config.train.early_stop_patience
                    ):
                        logger.info(
                            f"\n>>>>> Early Stop at Iter {iter_i + 1} "
                            f"(best miou: {best_metric})\n"
                        )
                        break
                if config.train.debug:
                    break

            if guard.requested:
                # SIGTERM arrived: the in-flight step finished (the state above
                # is a clean boundary at iter_i+1) — persist it WITH the data-
                # stream sidecar so --resume_all continues the exact run, then
                # exit fast (the grace period is for saving, not for finishing
                # the final validation).
                drain_metrics()
                wait_for_checkpoints()  # serialize with in-flight async saves
                if process_index == 0:
                    path = save_checkpoint(
                        config.train.checkpoint,
                        preempt_checkpoint_name(config, iter_i + 1),
                        state, config, wait=True,
                        loader_state=loader_sidecar(iter_i + 1),
                    )
                    logger.info(
                        f"preemption: SIGTERM at iter {iter_i + 1}; checkpoint "
                        f"saved to {path}; exiting {EXIT_PREEMPTED} for "
                        f"relaunch-and-resume"
                    )
                preempted = True
                break
    finally:
        # uninstall even when an exception escapes the loop — a dying
        # process must not keep shielding itself from SIGTERM during
        # teardown (ADVICE r4 low); then drain in-flight
        # --async_checkpoint writes before the process can exit
        # (background threads hold the uncommitted checkpoint dir).
        guard.uninstall()
        wait_for_checkpoints()

    if preempted:
        return True

    if config.train.fast_val:
        # end-of-training full host evaluation (AP + JSONL artifacts) — the
        # fast path above only produced them on new bests
        metrics_out, _, _ = inference(
            config, ema_eval_view(state), eval_step, val_loader_factory(),
            f"{cur_time()}_{config.run_tag('val_final')}.jsonl", logger=logger,
            plan=eval_plan,
        )
        logger.info(
            f"\n>>>>> Final evaluation (best mIoU@R1 {best_metric:.2f})\n"
            f"{pprint.pformat(metrics_out['brief'], indent=4)}\n"
        )
    return False


def main(argv=None) -> None:
    # multi-host bootstrap before any device use (the torch.distributed
    # init_process_group equivalent, train.py:362-366); no-op on one host
    from svol_tpu.parallel.distributed import initialize_multihost
    from svol_tpu.utils.compile_cache import enable_compile_cache

    initialize_multihost()
    enable_compile_cache()
    config = config_from_args(argv)
    logger = setup_logger(
        "SVOL", config.train.log_dir,
        distributed_rank=jax.process_index(),
        filename=cur_time() + "_train.txt",
    )
    if jax.process_index() == 0:
        logger.info("\n" + config_to_markdown(config))
    logger.info(f"devices: {len(jax.devices())}, processes: {jax.process_count()}")
    if train_val(config, logger):
        import sys

        sys.exit(EXIT_PREEMPTED)


if __name__ == "__main__":
    main()
