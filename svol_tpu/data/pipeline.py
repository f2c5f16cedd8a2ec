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
from svol_tpu.data.dataset import SVOLDataset, build_dataset, collate


class _GrainSource:
    """Adapts SVOLDataset to grain's RandomAccessDataSource protocol,
    returning only the device-bound arrays (metadata is eval-only)."""

    def __init__(self, dataset: SVOLDataset):
        self._ds = dataset

    def __len__(self) -> int:
        return len(self._ds)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        ex = self._ds[int(idx)]
        return {
            "src_sketch": ex.sketch,
            "src_video": ex.video,
            "src_sketch_mask": ex.sketch_mask,
            "src_video_mask": ex.video_mask,
            "boxes": ex.boxes,
            "box_valid": ex.box_valid,
        }


def grain_train_iterator(
    dataset: SVOLDataset,
    batch_size: int,
    num_workers: int = 4,
    seed: int = 1,
    shard_index: int = 0,
    shard_count: int = 1,
) -> Iterator[Dict[str, np.ndarray]]:
    """Infinite shuffled per-host-sharded batch stream via Grain."""
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
    loader = grain.DataLoader(
        data_source=_GrainSource(dataset),
        sampler=sampler,
        operations=[grain.Batch(batch_size=batch_size, drop_remainder=True)],
        worker_count=num_workers,
    )
    return iter(loader)


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
) -> Iterator[Tuple[Dict[str, np.ndarray], Dict[str, Any]]]:
    """Ordered batch stream with background decoding; yields
    (batch_arrays, {'targets': arrays, 'meta': [dicts]}).

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
        with ThreadPoolExecutor(max_workers=num_workers) as pool:
            for batch_idx in epochs():
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
):
    """Loader factory (the build_dataloader equivalent,
    svol_dataloader.py:59-84)."""
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
