"""Input pipeline: parallel decode + batch + device prefetch.

Replaces the reference's torch DataLoader + samplers
(lib/dataset/svol_dataloader.py:13-84, sampler/*.py):
  * iteration-based infinite training stream  (IterationBasedBatchSampler)
  * per-host sharding for multi-host SPMD     (the reference builds its
    loaders with distributed=False — train.py:172,180 — so every DDP rank
    saw the same batches; here sharding is actually wired up)
  * background workers + device prefetch so JPEG decode overlaps the step
    (decode dominates the reference's dataloading_time meter, train.py:213)

Two backends:
  * 'grain'   — Grain DataLoader with worker *processes* (default for train)
  * 'threads' — in-process ThreadPoolExecutor (cv2 decode releases the GIL);
                always used for eval, where deterministic order and host-side
                metadata matter more than throughput
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, List, Optional, Tuple

import numpy as np

from svol_tpu.config import SvolConfig
from svol_tpu.data.dataset import (
    SVOLDataset,
    SVOLExample,
    apply_hflip,
    build_dataset,
    collate,
)


class _GrainSource:
    """Adapts SVOLDataset to grain's RandomAccessDataSource protocol,
    returning only the device-bound arrays (metadata is eval-only).

    Returns UNAUGMENTED examples: grain's read layer calls ``__getitem__``
    from 16 read-ahead threads in scheduling-dependent order
    (ReadOptions(num_threads=16, prefetch_buffer_size=500)), so any
    dataset-side RNG state would be nondeterministic AND invisible to
    grain's checkpointable iterator state. Augmentation happens downstream
    in ``_HFlipAugment`` with grain's own per-record RNG."""

    def __init__(self, dataset: SVOLDataset):
        self._ds = dataset

    def __repr__(self) -> str:
        # stable across objects AND processes: grain embeds repr(data_source)
        # in its iterator state and refuses to set_state across a mismatch —
        # the default object repr (memory address) would reject every
        # .loader_state sidecar restore. Identity = what determines the
        # stream's content.
        d = self._ds
        return (
            f"_GrainSource(SVOLDataset(phase={d.phase}, n={len(d)}, "
            f"T={d.T}, K={d.K}, size={d.image_size}, seed={d.seed}, "
            f"video={d.video_dataset}, sketch={d.sketch_dataset}))"
        )

    def __len__(self) -> int:
        return len(self._ds)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        ex = self._ds.example(int(idx))
        return {
            "src_sketch": ex.sketch,
            "src_video": ex.video,
            "src_sketch_mask": ex.sketch_mask,
            "src_video_mask": ex.video_mask,
            "boxes": ex.boxes,
            "box_valid": ex.box_valid,
        }


def _make_hflip_augment(hflip_prob: float, per_frame_flip: bool,
                        flip_boxes: bool):
    """Reference RandomHorizontalFlip (svol_dataset.py:218-232) as a grain
    RandomMapTransform — see dataset.apply_hflip for the math. A factory so
    the grain import stays lazy; grain ships transforms to worker processes
    via cloudpickle (grain_pool.py), which handles the nested class."""
    import grain.python as grain

    class _HFlipAugment(grain.RandomMapTransform):
        def random_map(self, element, rng):
            ex = SVOLExample(
                video=element["src_video"],
                sketch=element["src_sketch"],
                video_mask=element["src_video_mask"],
                sketch_mask=element["src_sketch_mask"],
                boxes=element["boxes"],
                box_valid=element["box_valid"],
                meta=None,
            )
            ex = apply_hflip(
                ex, rng,
                hflip_prob=hflip_prob,
                per_frame_flip=per_frame_flip,
                flip_boxes=flip_boxes,
            )
            return {
                "src_sketch": ex.sketch,
                "src_video": ex.video,
                "src_sketch_mask": ex.sketch_mask,
                "src_video_mask": ex.video_mask,
                "boxes": ex.boxes,
                "box_valid": ex.box_valid,
            }

    return _HFlipAugment()


def grain_train_iterator(
    dataset: SVOLDataset,
    batch_size: int,
    num_workers: int = 4,
    seed: int = 1,
    shard_index: int = 0,
    shard_count: int = 1,
    initial_state: Optional[bytes] = None,
) -> Iterator[Dict[str, np.ndarray]]:
    """Infinite shuffled per-host-sharded batch stream via Grain.

    ``initial_state`` — bytes from a prior iterator's ``get_state()`` (the
    ``.loader_state`` checkpoint sidecar) — positions the stream exactly
    where the saving run left off, so a resumed run consumes the same batch
    sequence the uninterrupted run would have. Grain's state is the COMPLETE
    stream state: the source yields unaugmented examples and the flips are
    drawn by ``_HFlipAugment`` from grain's per-record RNG (seeded from the
    sampler seed + global record index), so augmentation draws restore too.
    """
    import grain.python as grain

    sampler = grain.IndexSampler(
        num_records=len(dataset),
        shard_options=grain.ShardOptions(
            shard_index=shard_index, shard_count=shard_count, drop_remainder=True
        ),
        shuffle=True,
        num_epochs=None,  # iteration-based, like IterationBasedBatchSampler
        seed=seed,
    )
    operations = []
    if dataset.phase == "train" and dataset.hflip_prob > 0:
        operations.append(_make_hflip_augment(
            dataset.hflip_prob, dataset.per_frame_flip, dataset.flip_boxes,
        ))
    operations.append(grain.Batch(batch_size=batch_size, drop_remainder=True))
    loader = grain.DataLoader(
        data_source=_GrainSource(dataset),
        sampler=sampler,
        operations=operations,
        worker_count=num_workers,
    )
    it = iter(loader)
    if initial_state is not None:
        it.set_state(initial_state)
    return it


class ResumableIterator:
    """Wraps a grain iterator, keeping a rolling window of ``get_state()``
    snapshots so the state at ANY recent batch boundary can be recovered.

    Grain's state is the complete stream state — sampler position AND
    augmentation draws, because the flips are drawn inside the loader from
    grain's per-record RNG (``_make_hflip_augment``), not from dataset-side
    counters the state couldn't see.

    Why not just ``get_state()`` at checkpoint time: ``device_prefetch`` (and
    the ``_stacked`` grouping in cli/train.py) pull the host stream several
    batches AHEAD of the optimizer step, so the live iterator state at save
    time is past the position the checkpoint's step counter corresponds to.
    Saving it verbatim would make a resumed run skip the batches that sat in
    the prefetch queue when the run died. Snapshotting *before* every fetch
    lets ``state_after(consumed)`` return the state in which exactly
    ``consumed`` batches have been drawn — the position a fresh iterator must
    take over from.
    """

    def __init__(self, it, history: int = 64):
        from collections import deque

        self._it = it
        self._states: "deque" = deque(maxlen=max(2, history))
        self._fetched = 0

    def __iter__(self):
        return self

    def __next__(self):
        self._states.append((self._fetched, self._it.get_state()))
        self._fetched += 1
        return next(self._it)

    @property
    def fetched(self) -> int:
        return self._fetched

    def state_after(self, consumed: int) -> Optional[bytes]:
        """``.loader_state`` sidecar (grain iterator state) for the boundary
        with exactly ``consumed`` batches drawn, or None if that boundary has
        aged out of the snapshot window (raise ``history``) or has not been
        reached yet."""
        if consumed == self._fetched:
            return self._it.get_state()
        for fetched, state in self._states:
            if fetched == consumed:
                return state
        return None


def threaded_batches(
    dataset: SVOLDataset,
    batch_size: int,
    num_workers: int = 4,
    shuffle: bool = False,
    seed: int = 1,
    infinite: bool = False,
    drop_remainder: bool = False,
    pad_to_batch: bool = False,
    prefetch: int = 2,
    shard_index: int = 0,
    shard_count: int = 1,
    skip_batches: int = 0,
) -> Iterator[Tuple[Dict[str, np.ndarray], Dict[str, Any]]]:
    """Ordered batch stream with background decoding; yields
    (batch_arrays, {'targets': arrays, 'meta': [dicts]}).

    ``skip_batches`` fast-forwards the stream by N batches at zero decode
    cost: the epoch shuffles and the per-index augmentation visit counters
    advance exactly as if the batches had been fetched (the augmentation RNG
    is a pure function of (seed, idx, visit) — dataset.py), so batch
    ``skip_batches`` here is bit-identical to batch ``skip_batches`` of an
    unskipped stream. This makes ``--resume_all`` reproduce the uninterrupted
    run's data order: position is a pure function of the restored step
    counter, per host, with nothing extra in the checkpoint.

    ``pad_to_batch`` keeps every yielded batch at exactly ``batch_size`` by
    replicating the final example of a short tail batch; ``meta`` lists only
    the real examples, so host-side result assembly drops the padding
    automatically. This pins the eval executable to ONE shape — without it, a
    val set not divisible by eval_bs compiles a second program for the tail
    (minutes per shape on slow-compile backends; see CLAUDE.md).
    """
    n = len(dataset)
    indices = list(range(shard_index, n, shard_count))

    def epochs() -> Iterator[List[int]]:
        rng = np.random.default_rng(seed)
        epoch = 0
        while True:
            order = list(indices)
            if shuffle:
                rng.shuffle(order)
            batches = [
                order[i : i + batch_size] for i in range(0, len(order), batch_size)
            ]
            if drop_remainder:
                batches = [b for b in batches if len(b) == batch_size]
            yield from batches
            epoch += 1
            if not infinite:
                return

    out_q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def put_or_stop(item) -> bool:
        """put with a timeout loop so an abandoned consumer (e.g. debug mode
        breaking after one batch) can't leave the producer blocked forever on
        a full queue — it notices stop and unwinds, releasing its pool."""
        while not stop.is_set():
            try:
                out_q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer() -> None:
        ep = epochs()
        for _ in range(skip_batches):
            batch_idx = next(ep, None)
            if batch_idx is None:
                break
            # replay augmentation state without decoding (see docstring)
            dataset.advance_visits(batch_idx)
        with ThreadPoolExecutor(max_workers=num_workers) as pool:
            for batch_idx in ep:
                if stop.is_set():
                    return
                examples = list(pool.map(dataset.__getitem__, batch_idx))
                n_real = len(examples)
                if pad_to_batch and n_real < batch_size:
                    examples = examples + [examples[-1]] * (batch_size - n_real)
                batch, extra = collate(examples)
                extra["meta"] = extra["meta"][:n_real]
                extra["n_real"] = n_real
                if not put_or_stop((batch, extra)):
                    return
            put_or_stop(None)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            item = out_q.get()
            if item is None:
                break
            yield item
    finally:
        stop.set()


def device_prefetch(iterator, place, size: int = 2):
    """Keep ``size`` batches in flight on the device.

    ``place`` maps a host batch to device arrays (e.g. MeshPlan.shard_batch).
    jax transfers are asynchronous — enqueueing the NEXT batch's host->device
    copy before yielding the current one overlaps the copy with the step's
    compute, hiding the transfer (the reference serializes its .to(device)
    inside the step, train.py:217; round 1 measured the batch transfer at 5x
    step compute on this environment's tunneled TPU).
    """
    from collections import deque

    q: deque = deque()
    try:
        for _ in range(max(1, size)):
            q.append(place(next(iterator)))
    except StopIteration:
        pass
    while q:
        out = q.popleft()
        try:
            q.append(place(next(iterator)))
        except StopIteration:
            pass
        yield out


def build_loader(
    config: SvolConfig,
    phase: str,
    dataset: Optional[SVOLDataset] = None,
    backend: str = "auto",
    shard_index: int = 0,
    shard_count: int = 1,
    skip_batches: int = 0,
    loader_state: Optional[bytes] = None,
):
    """Loader factory (the build_dataloader equivalent,
    svol_dataloader.py:59-84).

    Exact data-stream resume (train phase): ``loader_state`` restores a grain
    iterator from a checkpoint's ``.loader_state`` sidecar; ``skip_batches``
    fast-forwards the threads backend by index math (and is ignored by grain,
    where skipping would mean decoding every skipped batch).
    """
    ds = dataset if dataset is not None else build_dataset(config, phase)
    train = phase == "train"
    bs = config.data.bs if train else config.data.eval_bs
    if backend == "auto":
        backend = config.data.loader_backend
    if backend == "auto":
        backend = "grain" if train else "threads"

    if backend == "grain" and train:
        return grain_train_iterator(
            ds, bs, num_workers=config.data.num_workers, seed=config.train.seed,
            shard_index=shard_index, shard_count=shard_count,
            initial_state=loader_state,
        )
    stream = threaded_batches(
        ds, bs,
        num_workers=max(1, config.data.num_workers),
        shuffle=train,
        seed=config.train.seed,
        infinite=train,
        drop_remainder=train,
        pad_to_batch=not train,  # one executable shape across the val epoch
        prefetch=config.data.prefetch_buffer,
        shard_index=shard_index,
        shard_count=shard_count,
        skip_batches=skip_batches if train else 0,
    )
    if not train:
        return stream

    def flat() -> Iterator[Dict[str, np.ndarray]]:
        # train consumers expect one flat dict per batch (grain format)
        for batch, extra in stream:
            merged = dict(batch)
            merged.update(extra["targets"])
            yield merged

    return flat()
