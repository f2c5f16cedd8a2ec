"""Int8 serving path (ops/quant.py + QuantizableConv): numerical closeness
to the float path, param-tree compatibility (checkpoints are oblivious to
quantization), and train-mode bypass."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svol_tpu.models.resnet import QuantizableConv, resnet18
from svol_tpu.ops.quant import int8_conv, quantize_weights


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_int8_conv_close_to_f32(rng):
    x = jnp.asarray(rng.normal(size=(2, 14, 14, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 64, 32)) * 0.05, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, k.shape, ("NHWC", "HWIO", "NHWC")),
    )
    out = int8_conv(x, k, (1, 1), 1)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    # 8-bit symmetric quant on gaussian data: ~1% relative error envelope
    assert rel < 0.02, rel


def test_quantize_weights_roundtrip(rng):
    k = jnp.asarray(rng.normal(size=(3, 3, 8, 16)), jnp.float32)
    wq, wscale = quantize_weights(k)
    assert wq.dtype == jnp.int8 and wscale.shape == (16,)
    err = float(jnp.max(jnp.abs(wq.astype(jnp.float32) * wscale - k)))
    assert err <= float(jnp.max(wscale)) * 0.5 + 1e-6  # half-ulp rounding


def test_quantizable_conv_float_path_matches_nn_conv(rng):
    """quantize=None must reproduce flax nn.Conv bit-for-bit (the torch
    parity suite depends on it)."""
    import flax.linen as nn

    x = jnp.asarray(rng.normal(size=(2, 8, 8, 6)), jnp.float32)
    ours = QuantizableConv(12, (3, 3), strides=(2, 2), padding=1)
    theirs = nn.Conv(12, (3, 3), strides=(2, 2), padding=1, use_bias=False)
    p1 = ours.init(jax.random.PRNGKey(0), x)
    y1 = ours.apply(p1, x)
    y2 = theirs.apply({"params": {"kernel": p1["params"]["kernel"]}}, x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_resnet_param_tree_identical_and_quant_close(rng):
    """Same params work for both modes; int8 features stay close; train=True
    bypasses quantization (identical to float trunk)."""
    x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)), jnp.float32)
    net_f = resnet18(include_pool=True)
    net_q = resnet18(include_pool=True, quantize="int8")
    params = net_f.init(jax.random.PRNGKey(0), x)
    params_q = net_q.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_q)

    yf = net_f.apply(params, x)
    yq = net_q.apply(params, x)
    rel = float(jnp.linalg.norm(yq - yf) / (jnp.linalg.norm(yf) + 1e-9))
    assert rel < 0.15, rel  # 18 stacked int8 convs; error compounds but bounded

    # train-mode bypass: identical to the float path (mutable BN stats)
    yt_f, _ = net_f.apply(params, x, train=True, mutable=["batch_stats"])
    yt_q, _ = net_q.apply(params, x, train=True, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(yt_f), np.asarray(yt_q))


def test_full_model_int8_forward(rng):
    """End-to-end predict with --quantize int8 runs and scores stay finite
    and broadly consistent with the float model."""
    from svol_tpu.config import DataConfig, ModelConfig, SvolConfig
    from svol_tpu.models import build_model

    def cfg(q):
        return SvolConfig(
            data=DataConfig(num_frames=2, max_boxes_per_frame=2, image_size=64),
            model=ModelConfig(hidden_dim=32, nheads=4, num_layers=1,
                              num_queries=4, num_queries_per_frame=2,
                              cmt_dim_feedforward=64, compute_dtype="float32",
                              quantize=q),
        )

    batch = {
        "src_sketch": rng.uniform(size=(1, 1, 64, 64, 3)).astype(np.float32),
        "src_video": rng.uniform(size=(1, 2, 64, 64, 3)).astype(np.float32),
        "src_sketch_mask": np.ones((1, 1), np.float32),
        "src_video_mask": np.ones((1, 2), np.float32),
    }
    model_f = build_model(cfg(None))
    model_q = build_model(cfg("int8"))
    variables = model_f.init(jax.random.PRNGKey(0), **batch)
    out_f = model_f.apply(variables, **batch)
    out_q = model_q.apply(variables, **batch)
    for k in ("pred_logits", "pred_boxes"):
        a, b = np.asarray(out_f[k]), np.asarray(out_q[k])
        assert np.isfinite(b).all()
        assert np.abs(a - b).max() < 0.5, (k, np.abs(a - b).max())


def test_static_calibration_scales(rng):
    """calibrate_scales collects per-conv amax on exact-float forwards; the
    static-scale int8 apply stays close to float and matches the dynamic
    path's quality."""
    from svol_tpu.ops.quant import calibrate_scales
    from svol_tpu.config import DataConfig, ModelConfig, SvolConfig
    from svol_tpu.models import build_model

    cfg = SvolConfig(
        data=DataConfig(num_frames=2, max_boxes_per_frame=2, image_size=64),
        model=ModelConfig(hidden_dim=32, nheads=4, num_layers=1,
                          num_queries=4, num_queries_per_frame=2,
                          cmt_dim_feedforward=64, compute_dtype="float32",
                          quantize="int8"),
    )
    def mk_batch(seed):
        r = np.random.default_rng(seed)
        return {
            "src_sketch": r.uniform(size=(1, 1, 64, 64, 3)).astype(np.float32),
            "src_video": r.uniform(size=(1, 2, 64, 64, 3)).astype(np.float32),
            "src_sketch_mask": np.ones((1, 1), np.float32),
            "src_video_mask": np.ones((1, 2), np.float32),
        }

    model_q = build_model(cfg)
    cfg_f = SvolConfig.from_dict(cfg.to_dict())
    cfg_f.model.quantize = None
    model_f = build_model(cfg_f)
    batch = mk_batch(0)
    variables = model_f.init(jax.random.PRNGKey(0), **batch)

    quant = calibrate_scales(model_q, variables, [mk_batch(0), mk_batch(1)],
                             max_batches=2)
    leaves = jax.tree_util.tree_leaves(quant)
    assert leaves and all(float(a) > 0 for a in leaves)
    # running max accumulates (calibrating again on the same data is a no-op)
    quant2 = calibrate_scales(model_q, {**variables, "quant": quant},
                              [mk_batch(0)], max_batches=1)
    for a, b in zip(jax.tree_util.tree_leaves(quant),
                    jax.tree_util.tree_leaves(quant2)):
        assert float(b) >= float(a) - 1e-6

    out_f = model_f.apply(variables, **batch)
    out_static = model_q.apply({**variables, "quant": quant}, **batch)
    out_dyn = model_q.apply(variables, **batch)
    for k in ("pred_logits", "pred_boxes"):
        a = np.asarray(out_f[k])
        err_static = np.abs(np.asarray(out_static[k]) - a).max()
        err_dyn = np.abs(np.asarray(out_dyn[k]) - a).max()
        assert np.isfinite(np.asarray(out_static[k])).all()
        assert err_static < 0.5, (k, err_static)
        # calibrated-on-this-data static scales should not be much worse
        assert err_static < err_dyn * 2.5 + 0.05, (k, err_static, err_dyn)
