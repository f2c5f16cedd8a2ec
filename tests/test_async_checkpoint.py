"""--async_checkpoint: orbax background-thread saves (train/checkpoints.py).

The save must be byte-faithful to the synchronous path, consecutive async
saves must serialize (no corrupt/overlapping directory writes), and
wait_for_checkpoints() must make every pending write durable and be
idempotent. The reference blocks training on torch.save at every
checkpoint (/root/reference/train.py:267-284)."""
import jax
import numpy as np

from svol_tpu.models import build_model
from svol_tpu.train import create_train_state
from svol_tpu.train.checkpoints import (
    restore_checkpoint,
    save_checkpoint,
    wait_for_checkpoints,
)

from test_seq_parallel import make_batch, make_cfg


def _assert_state_equal(a, b):
    for x, y in zip(jax.tree.leaves((a.params, a.batch_stats, a.opt_state)),
                    jax.tree.leaves((b.params, b.batch_stats, b.opt_state))):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_async_save_restores_identically(rng, tmp_path):
    cfg = make_cfg()
    batch = make_batch(rng, B=2)
    sample = {k: batch[k] for k in
              ("src_sketch", "src_video", "src_sketch_mask", "src_video_mask")}
    state = create_train_state(cfg, build_model(cfg), jax.random.PRNGKey(0),
                               sample)
    other = create_train_state(cfg, build_model(cfg), jax.random.PRNGKey(7),
                               sample)

    # two back-to-back async saves: the second must join the first's
    # background write (the serialize path), not race it
    p1 = save_checkpoint(str(tmp_path), "ckpt_a", state, cfg, wait=False)
    p2 = save_checkpoint(str(tmp_path), "ckpt_b", other, cfg, wait=False)
    wait_for_checkpoints()
    wait_for_checkpoints()  # idempotent

    import os

    assert os.path.isdir(p1) and os.path.isdir(p2)
    assert os.path.exists(p1 + ".config.json")

    r1 = restore_checkpoint(p1, other, restore_all=True)
    _assert_state_equal(r1, state)
    r2 = restore_checkpoint(p2, state, restore_all=True)
    _assert_state_equal(r2, other)

    # overwrite-in-place (the best_model path is rewritten on every new
    # best): async save over an existing committed directory
    save_checkpoint(str(tmp_path), "ckpt_a", other, cfg, wait=False)
    wait_for_checkpoints()
    r3 = restore_checkpoint(p1, state, restore_all=True)
    _assert_state_equal(r3, other)


def test_async_checkpoint_cli_flag():
    from svol_tpu.config import config_from_args

    assert config_from_args(["--async_checkpoint"]).train.async_checkpoint
    assert not config_from_args([]).train.async_checkpoint
