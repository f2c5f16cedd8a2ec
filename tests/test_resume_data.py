"""Exact data-stream resume: a resumed run consumes the same batch sequence
the uninterrupted run would have.

This EXCEEDS the reference: its IterationBasedBatchSampler
(lib/dataset/sampler/iteration_based_batch_sampler.py:30-41) only offsets the
iteration counter — the underlying stream (shuffle order, augmentation draws)
restarts from scratch on resume. Here:

  * threads backend — the stream position is a pure function of the step
    counter: ``skip_batches`` replays the epoch shuffles and the per-index
    augmentation visit counters by index math, zero decode cost
    (data/pipeline.py::threaded_batches, data/dataset.py::advance_visits);
  * grain backend — the iterator state at exactly the checkpoint's batch
    boundary is saved as a ``.loader_state`` sidecar (the rolling-snapshot
    ResumableIterator compensates for device_prefetch running ahead) and
    restored by ``--resume_all`` (cli/train.py, train/checkpoints.py).

The end-to-end tests assert the strongest property: (train 4 iters) and
(train 2 iters; crash; resume 2 more) produce bit-identical parameters.
"""
import glob
import os

import numpy as np
import pytest

from svol_tpu.config import DataConfig, ModelConfig, SvolConfig, TrainConfig
from svol_tpu.data.dataset import build_dataset
from svol_tpu.data.pipeline import (
    ResumableIterator,
    grain_train_iterator,
    threaded_batches,
)
from svol_tpu.data.synthetic import generate_synthetic_dataset
from svol_tpu.utils import setup_logger

T, K, IMG = 4, 3, 64


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("svol_resume_fixture"))
    generate_synthetic_dataset(root, frames_per_video=6)
    return root


def make_cfg(root, tmp, backend="threads", resume="", accum_steps=1):
    return SvolConfig(
        data=DataConfig(
            root=root, anno_root=os.path.join(root, "annos"),
            num_frames=T, max_boxes_per_frame=K, image_size=IMG,
            bs=8, eval_bs=4, num_workers=0 if backend == "grain" else 2,
            loader_backend=backend,
        ),
        model=ModelConfig(
            hidden_dim=32, nheads=4, num_layers=2, num_queries=T * K,
            num_queries_per_frame=K, cmt_dim_feedforward=64,
            compute_dtype="float32",
        ),
        train=TrainConfig(
            results_dir=os.path.join(tmp, "results"),
            checkpoint=os.path.join(tmp, "save"),
            log_dir=os.path.join(tmp, "logs"),
            num_iters=4, save_interval=2, val_interval=1000,
            resume=resume, resume_all=bool(resume),
            accum_steps=accum_steps,
        ),
    )


def _take(stream, n):
    out = []
    for _ in range(n):
        batch, extra = next(stream)
        out.append((batch, extra["targets"]))
    return out


def _assert_batches_equal(a, b):
    for (ba, ta), (bb, tb) in zip(a, b):
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k], err_msg=k)
        for k in ta:
            np.testing.assert_array_equal(ta[k], tb[k], err_msg=k)


def test_threads_skip_batches_matches_unskipped_stream(fixture_root):
    """Batch i of a skip_batches=5 stream == batch 5+i of a fresh stream,
    bit-exact — including the augmentation flips, whose RNG depends on the
    per-index visit counters the fast-forward must replay (two epochs of the
    16-pair fixture at bs=4 are crossed, so counters matter)."""
    cfg = make_cfg(fixture_root, "/tmp")

    def stream(skip):
        ds = build_dataset(cfg, "train")  # fresh visit counters
        return threaded_batches(
            ds, 4, num_workers=1, shuffle=True, seed=7, infinite=True,
            drop_remainder=True, skip_batches=skip,
        )

    full = _take(stream(0), 9)
    resumed = _take(stream(5), 4)
    _assert_batches_equal(full[5:], resumed)


def test_threads_skip_differs_from_start(fixture_root):
    """Sanity: the skipped stream is actually offset (shuffle works)."""
    cfg = make_cfg(fixture_root, "/tmp")
    ds = build_dataset(cfg, "train")
    a = _take(threaded_batches(ds, 4, shuffle=True, seed=7, infinite=True,
                               drop_remainder=True), 1)
    ds2 = build_dataset(cfg, "train")
    b = _take(threaded_batches(ds2, 4, shuffle=True, seed=7, infinite=True,
                               drop_remainder=True, skip_batches=3), 1)
    assert any(
        not np.array_equal(a[0][0][k], b[0][0][k]) for k in a[0][0]
    )


def test_grain_resumable_iterator_state_roundtrip(fixture_root):
    """ResumableIterator.state_after(k) hands back the stream state with
    exactly k batches drawn, even though the wrapper has been pulled ahead —
    a fresh iterator seeded with it continues at batch k, augmentation draws
    included (the 16-pair fixture at bs=4 wraps an epoch within 7 batches, so
    the sidecar's visit counters matter, not just grain's sampler state)."""
    cfg = make_cfg(fixture_root, "/tmp", backend="grain")

    def fresh_iter(initial_state=None):
        ds = build_dataset(cfg, "train")
        return grain_train_iterator(
            ds, 4, num_workers=0, seed=3, initial_state=initial_state
        )

    wrapped = ResumableIterator(fresh_iter(), history=8)
    fetched = [next(wrapped) for _ in range(7)]  # prefetch overshoot past 4
    assert wrapped.fetched == 7
    state = wrapped.state_after(4)
    assert state is not None
    assert wrapped.state_after(99) is None  # not reached yet

    resumed = fresh_iter(initial_state=state)
    for i in range(4, 7):
        got = next(resumed)
        for k in fetched[i]:
            np.testing.assert_array_equal(fetched[i][k], got[k], err_msg=k)

    # live boundary: state_after(fetched) == current get_state()
    assert wrapped.state_after(7) is not None


def test_grain_worker_processes_match_inprocess_stream(fixture_root):
    """The flip RandomMapTransform rides grain's per-record RNG, so the
    stream is a pure function of (seed, record index) — worker_count=1
    (separate process, transform shipped via cloudpickle) must produce the
    byte-identical stream to worker_count=0, and iterator-state restore must
    work across the process boundary too. With the old dataset-side visit
    counters this could not hold: each worker had its own counter copy."""
    cfg = make_cfg(fixture_root, "/tmp", backend="grain")

    def take_n(workers, n, initial_state=None):
        ds = build_dataset(cfg, "train")
        it = grain_train_iterator(
            ds, 4, num_workers=workers, seed=3, initial_state=initial_state
        )
        out, states = [], []
        for _ in range(n):
            states.append(it.get_state())
            out.append(next(it))
        return out, states

    inproc, _ = take_n(0, 6)
    workered, states = take_n(1, 6)
    for a, b in zip(inproc, workered):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    # restore mid-stream into a worker-process loader
    resumed, _ = take_n(1, 2, initial_state=states[4])
    for i, got in zip((4, 5), resumed):
        for k in inproc[i]:
            np.testing.assert_array_equal(inproc[i][k], got[k], err_msg=k)


def _final_ckpt_params(save_dir):
    import orbax.checkpoint as ocp

    path = glob.glob(os.path.join(save_dir, "0003_model_*"))
    dirs = [p for p in path if os.path.isdir(p)]
    assert len(dirs) == 1, f"expected one final checkpoint, got {path}"
    restored = ocp.StandardCheckpointer().restore(dirs[0])
    return restored["params"], restored["opt_state"]


def _assert_trees_identical(a, b):
    import jax

    leaves_a, treedef_a = jax.tree.flatten(a)
    leaves_b, treedef_b = jax.tree.flatten(b)
    assert treedef_a == treedef_b
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


@pytest.mark.parametrize("backend,accum", [
    ("threads", 1),
    ("grain", 1),
    # accum exercises the batches_per_iter arithmetic: each optimizer
    # iteration consumes accum_steps host batches, so the sidecar / fast-
    # forward position is iters x accum, not iters
    ("grain", 2),
])
def test_resume_reproduces_uninterrupted_run(
    fixture_root, tmp_path, backend, accum
):
    """Gold test: params after (4 iters) == params after (2 iters -> kill ->
    --resume_all 2 more), bit for bit — data order, augmentation draws and
    optimizer trajectory all line up. Fails if the stream restarts on resume
    (reference behavior) because iters 3-4 then train on epoch-0 batches."""
    from svol_tpu.cli.train import train_val

    logger = setup_logger(
        "SVOL-resume-test", str(tmp_path / "logs"), distributed_rank=0
    )

    cfg_a = make_cfg(
        fixture_root, str(tmp_path / "a"), backend=backend, accum_steps=accum
    )
    train_val(cfg_a, logger)
    params_a, opt_a = _final_ckpt_params(cfg_a.train.checkpoint)

    mid = glob.glob(os.path.join(cfg_a.train.checkpoint, "0001_model_*"))
    mid = [p for p in mid if os.path.isdir(p)]
    assert len(mid) == 1
    if backend == "grain":
        assert os.path.exists(mid[0] + ".loader_state"), (
            "grain checkpoints must carry the input-stream sidecar"
        )

    cfg_b = make_cfg(
        fixture_root, str(tmp_path / "b"), backend=backend, resume=mid[0],
        accum_steps=accum,
    )
    train_val(cfg_b, logger)
    params_b, opt_b = _final_ckpt_params(cfg_b.train.checkpoint)

    _assert_trees_identical(params_a, params_b)
    _assert_trees_identical(opt_a, opt_b)
