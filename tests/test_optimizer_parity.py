"""Optimizer-TRAJECTORY parity vs torch: 5 AdamW steps from identical ported
weights on identical batches, parameters compared leaf-for-leaf after every
step (VERDICT r3, Next #5 — gradient parity alone leaves moment estimates,
bias correction, weight-decay ordering and the LR schedule unproven).

torch side: torch.optim.AdamW + StepLR exactly as the reference builds them
(train.py:94-143: AdamW(lr, wd) over all params, StepLR(step_size=
lr_drop_step)); the LR drop lands MID-trajectory (step 3 of 5) so the
schedule's step accounting is part of the comparison. jax side: the real
production transformation ``svol_tpu.train.state.make_optimizer`` (optax
adamw + our steplr schedule).

Both sides run the model deterministic/eval (dropout is framework-random and
not part of optimizer dynamics). Reuses the ported-weight machinery from
test_full_model_parity (same tests/ dir, imported as a module).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import optax

import test_full_model_parity as fmp

pytestmark = pytest.mark.skipif(not fmp.HAS_REF,
                                reason="reference repo not importable")

N_STEPS = 5
LR_DROP = 3  # LR *= 0.1 after this many scheduler steps — mid-trajectory
LR, WD = 1e-4, 1e-4


def _make_step_batches(n_steps: int, seed: int = 0):
    """A DIFFERENT batch per step (constant batches would let broken moment
    accumulators cancel out)."""
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(n_steps):
        inputs = fmp.make_inputs(rng, masked=False)
        ref_targets, dense_targets = fmp.make_ragged_targets(rng)
        batches.append((inputs, ref_targets, dense_targets))
    return batches


def _flat(tree):
    return {jax.tree_util.keystr(kp): np.asarray(g) for kp, g in
            jax.tree_util.tree_leaves_with_path(tree)}


def test_adamw_steplr_trajectory_matches_torch(rng):
    from svol_tpu.config import SvolConfig
    from svol_tpu.losses.criterion import build_criterion
    from svol_tpu.train.state import make_optimizer
    from svol_tpu.utils.torch_port import convert_svanet

    tmodel, fmodel, params0 = fmp.build_pair()
    # build_pair harvests the state dict with .numpy(), which SHARES storage
    # with the torch parameters — optimizer.step() below would mutate the
    # ported tree's pass-through leaves (biases) in place. Deep-copy first.
    params0 = jax.tree.map(np.array, params0)
    batches = _make_step_batches(N_STEPS)

    # ---- torch trajectory (reference train.py:98-99,130-131,255) ----
    criterion_ref = fmp.ref_build_loss(fmp.ref_args())
    optimizer = torch.optim.AdamW(tmodel.parameters(), lr=LR, weight_decay=WD)
    scheduler = torch.optim.lr_scheduler.StepLR(optimizer, step_size=LR_DROP)
    torch_params_per_step = []
    torch_grads_per_step = []
    for (src_sketch, sketch_mask, src_video, video_mask), ref_targets, _ in batches:
        t_out = tmodel(
            src_sketch=torch.from_numpy(src_sketch),
            src_sketch_mask=torch.from_numpy(sketch_mask),
            src_video=torch.from_numpy(src_video),
            src_video_mask=torch.from_numpy(video_mask),
        )
        ref_losses = criterion_ref(t_out, ref_targets)
        total = sum(ref_losses[k] * w
                    for k, w in criterion_ref.weight_dict.items()
                    if k in ref_losses)
        optimizer.zero_grad()
        total.backward()
        named = dict(tmodel.named_parameters())
        grad_sd = {}
        for k, vv in tmodel.state_dict().items():
            g = named[k].grad if k in named and named[k].grad is not None else None
            grad_sd[k] = (g.numpy().copy() if g is not None
                          else np.zeros_like(vv.numpy()))
        torch_grads_per_step.append(convert_svanet(
            grad_sd, num_layers=fmp.LAYERS, n_input_proj=2, d_model=fmp.D_MODEL
        )["params"])
        optimizer.step()
        scheduler.step()
        sd = {k: v.detach().numpy().copy() for k, v in tmodel.state_dict().items()}
        torch_params_per_step.append(convert_svanet(
            sd, num_layers=fmp.LAYERS, n_input_proj=2, d_model=fmp.D_MODEL
        )["params"])

    # ---- jax trajectory through the PRODUCTION optimizer ----
    cfg = SvolConfig()
    cfg.model.num_layers = fmp.LAYERS
    cfg.model.num_queries = fmp.Q
    cfg.model.num_queries_per_frame = fmp.K
    cfg.train.lr, cfg.train.wd = LR, WD
    cfg.train.optimizer, cfg.train.scheduler = "adamw", "steplr"
    cfg.train.lr_drop_step = LR_DROP
    criterion = build_criterion(cfg)
    tx = make_optimizer(cfg)

    def loss_fn(p, inputs, dense_targets):
        src_sketch, sketch_mask, src_video, video_mask = inputs
        out = fmodel.apply({"params": p}, src_sketch, sketch_mask,
                           src_video, video_mask, deterministic=True)
        return criterion(out, dense_targets)["loss_overall"]

    grad_fn = jax.jit(jax.grad(loss_fn))
    params = params0["params"]
    opt_state = tx.init(params)
    max_diff_per_step = []
    noise = {}  # key -> accumulated noise-gradient element mask
    for step, ((s, sm, v, vm), _, dense_targets) in enumerate(batches):
        grads = grad_fn(params, (s, sm, v, vm), dense_targets)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        flat_ours = _flat(params)
        flat_ref = _flat(torch_params_per_step[step])
        flat_g = _flat(torch_grads_per_step[step])
        assert set(flat_ref).issubset(set(flat_ours))
        worst = 0.0
        for key, p_ref in flat_ref.items():
            p_our = flat_ours[key]
            # Elements whose TRUE gradient is at float-noise level get an
            # Adam update of ±lr decided by rounding noise (m̂/√v̂ = ±1
            # whatever the magnitude) — irreproducible across frameworks by
            # construction. Two real cases: the k_proj bias (its gradient
            # is exactly zero — shifting every key shifts all of a query's
            # logits equally, softmax-invariant) and isolated elements of
            # large kernels crossing zero. Mask them (offsets accumulate
            # ±lr per step); everything else must track torch tightly.
            noise[key] = noise.get(key, False) | (np.abs(flat_g[key]) < 1e-6)
            diff = np.abs(p_our - p_ref)
            ok = (diff <= 1e-5 + 1e-4 * np.abs(p_ref)) | (
                noise[key] & (diff <= 2.5e-4 * (step + 1)))
            assert ok.all(), (
                f"step {step}: {key}: {int((~ok).sum())}/{ok.size} elements "
                f"diverged, worst {diff.max():.2e} "
                f"(noise-masked: {int(noise[key].sum())})")
            worst = max(worst, float(diff[~noise[key]].max())
                        if (~noise[key]).any() else 0.0)
        # the mask must stay a vanishing fraction — a broken optimizer
        # cannot hide behind it
        n_masked = sum(int(m.sum()) for m in noise.values())
        n_total = sum(m.size for m in noise.values())
        assert n_masked < 0.05 * n_total, (n_masked, n_total)
        max_diff_per_step.append(worst)

    # the LR drop must actually have happened on both sides: steps 4-5 move
    # parameters ~10x less than steps 1-3
    q = [_flat(p) for p in torch_params_per_step]
    key = next(k for k in q[0] if "query_embed" in k)
    move_pre = np.abs(q[2][key] - q[1][key]).max()
    move_post = np.abs(q[4][key] - q[3][key]).max()
    assert move_post < move_pre * 0.3, (move_pre, move_post)
