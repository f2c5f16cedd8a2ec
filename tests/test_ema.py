"""Parameter EMA (--ema_decay): shadow update math, eval view, and every
checkpoint migration direction. Capability beyond the reference (no EMA
anywhere in /root/reference/train.py)."""
import jax
import numpy as np
import pytest

from svol_tpu.losses.criterion import build_criterion
from svol_tpu.models import build_model
from svol_tpu.parallel import make_mesh_plan
from svol_tpu.train import create_train_state, make_train_step
from svol_tpu.train.checkpoints import restore_checkpoint, save_checkpoint
from svol_tpu.train.state import ema_eval_view

from test_seq_parallel import make_batch, make_cfg

DECAY = 0.75  # far from 1 so two steps move the shadow visibly


def _cfg(ema=DECAY):
    cfg = make_cfg()
    cfg.train.ema_decay = ema
    cfg.validate()
    return cfg


def _setup(cfg, batch):
    inputs = {k: batch[k] for k in
              ("src_sketch", "src_video", "src_sketch_mask", "src_video_mask")}
    state = create_train_state(cfg, build_model(cfg), jax.random.PRNGKey(0),
                               inputs)
    plan = make_mesh_plan(num_devices=1)
    state = plan.replicate(state)
    step = make_train_step(cfg, build_criterion(cfg), donate=False)
    db = plan.shard_batch(dict(batch))
    return state, step, db, plan


def test_ema_matches_closed_form(rng):
    """After two steps: ema_2 = d*(d*p0 + (1-d)*p1) + (1-d)*p2, leaf-exact
    against the recorded param trajectory."""
    cfg = _cfg()
    batch = make_batch(rng, B=4)
    state, step, db, plan = _setup(cfg, batch)

    p = [state.params]
    with plan.activate():
        s1, _ = step(state, db, jax.random.PRNGKey(1))
        p.append(s1.params)
        s2, _ = step(s1, db, jax.random.PRNGKey(1))
        p.append(s2.params)

    d = DECAY
    want = jax.tree.map(
        lambda p0, p1, p2: d * (d * p0 + (1 - d) * p1) + (1 - d) * p2,
        p[0], p[1], p[2])
    for a, b in zip(jax.tree.leaves(s2.ema_params), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)
    # the shadow must lag the raw params (it still carries p0 weight)
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree.leaves(s2.ema_params),
                             jax.tree.leaves(s2.params))]
    assert max(diffs) > 0


def test_ema_off_is_none_and_view_identity(rng):
    cfg = _cfg(ema=0.0)
    batch = make_batch(rng, B=2)
    state, step, db, plan = _setup(cfg, batch)
    assert state.ema_params is None
    with plan.activate():
        s1, _ = step(state, db, jax.random.PRNGKey(1))
    assert s1.ema_params is None
    assert ema_eval_view(s1) is s1


def test_ema_eval_view_swaps_params(rng):
    cfg = _cfg()
    batch = make_batch(rng, B=2)
    state, step, db, plan = _setup(cfg, batch)
    with plan.activate():
        s1, _ = step(state, db, jax.random.PRNGKey(1))
    view = ema_eval_view(s1)
    for a, b in zip(jax.tree.leaves(view.params),
                    jax.tree.leaves(s1.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ema_checkpoint_migrations(rng, tmp_path):
    """EMA ckpt -> EMA run (shadow restored); EMA ckpt -> plain run (shadow
    dropped, params restored); plain ckpt -> EMA run (shadow seeded at the
    restored params)."""
    batch = make_batch(rng, B=2)
    sample = {k: batch[k] for k in
              ("src_sketch", "src_video", "src_sketch_mask", "src_video_mask")}

    cfg_ema = _cfg()
    state, step, db, plan = _setup(cfg_ema, batch)
    with plan.activate():
        s1, _ = step(state, db, jax.random.PRNGKey(1))
    path = save_checkpoint(str(tmp_path), "ema_ckpt", s1, cfg_ema)

    fresh_ema = create_train_state(cfg_ema, build_model(cfg_ema),
                                   jax.random.PRNGKey(9), sample)
    r = restore_checkpoint(path, fresh_ema)
    for a, b in zip(jax.tree.leaves(r.ema_params),
                    jax.tree.leaves(s1.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(r.params), jax.tree.leaves(s1.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    cfg_plain = _cfg(ema=0.0)
    fresh_plain = create_train_state(cfg_plain, build_model(cfg_plain),
                                     jax.random.PRNGKey(9), sample)
    r2 = restore_checkpoint(path, fresh_plain)
    assert r2.ema_params is None
    for a, b in zip(jax.tree.leaves(r2.params), jax.tree.leaves(s1.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    plain_path = save_checkpoint(str(tmp_path), "plain_ckpt", r2, cfg_plain)
    r3 = restore_checkpoint(plain_path, fresh_ema)
    for a, b in zip(jax.tree.leaves(r3.ema_params),
                    jax.tree.leaves(r3.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ema_config_validation():
    cfg = make_cfg()
    cfg.train.ema_decay = 1.0
    with pytest.raises(ValueError, match="ema_decay"):
        cfg.validate()
    cfg.train.ema_decay = -0.1
    with pytest.raises(ValueError, match="ema_decay"):
        cfg.validate()


def test_ema_composes_with_donation(rng):
    """Regression: the EMA shadow must never ALIAS the params — a donated
    train step then hands XLA the same buffer twice and aborts ('Attempt to
    donate the same buffer twice in Execute()'). Covers both creation and
    the plain-checkpoint -> EMA-run seeding path."""
    cfg = _cfg()
    batch = make_batch(rng, B=2)
    inputs = {k: batch[k] for k in
              ("src_sketch", "src_video", "src_sketch_mask", "src_video_mask")}
    state = create_train_state(cfg, build_model(cfg), jax.random.PRNGKey(0),
                               inputs)
    plan = make_mesh_plan(num_devices=1)
    state = plan.replicate(state)
    step = make_train_step(cfg, build_criterion(cfg), donate=True)
    db = plan.shard_batch(dict(batch))
    with plan.activate():
        s1, metrics = step(state, db, jax.random.PRNGKey(1))
        s2, metrics = step(s1, db, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss_overall"]))
