"""Weight-port converters: structural match against our modules, and numeric
parity vs a randomly-initialized HF ViTModel (no downloads needed)."""
import jax
import numpy as np
import pytest

from svol_tpu.models.resnet import ResNet, BasicBlock, resnet18
from svol_tpu.models.vit import ViT
from svol_tpu.utils.torch_port import (
    convert_hf_vit,
    convert_resnet18,
)


def fake_torchvision_resnet_sd(rng, stage_sizes=(2, 2, 2, 2)):
    """Random state dict with torchvision BasicBlock-resnet names/shapes."""
    sd = {}

    def conv(name, cout, cin, k):
        sd[name + ".weight"] = rng.normal(size=(cout, cin, k, k)).astype(np.float32)

    def bn(name, c):
        sd[name + ".weight"] = rng.normal(size=(c,)).astype(np.float32)
        sd[name + ".bias"] = rng.normal(size=(c,)).astype(np.float32)
        sd[name + ".running_mean"] = rng.normal(size=(c,)).astype(np.float32)
        sd[name + ".running_var"] = rng.uniform(0.5, 1.5, size=(c,)).astype(np.float32)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    cin = 64
    for stage, (blocks, cout) in enumerate(
        zip(stage_sizes, (64, 128, 256, 512)), start=1
    ):
        for b in range(blocks):
            pre = f"layer{stage}.{b}"
            conv(pre + ".conv1", cout, cin if b == 0 else cout, 3)
            bn(pre + ".bn1", cout)
            conv(pre + ".conv2", cout, cout, 3)
            bn(pre + ".bn2", cout)
            if b == 0 and cin != cout:
                conv(pre + ".downsample.0", cout, cin, 1)
                bn(pre + ".downsample.1", cout)
        cin = cout
    # fc layer present in torchvision but unused by our truncated trunk
    sd["fc.weight"] = rng.normal(size=(1000, 512)).astype(np.float32)
    sd["fc.bias"] = rng.normal(size=(1000,)).astype(np.float32)
    return sd


def tree_structure_equal(a, b, path=""):
    if isinstance(a, dict) and isinstance(b, dict):
        assert set(a) == set(b), f"{path}: {set(a) ^ set(b)}"
        for k in a:
            tree_structure_equal(a[k], b[k], path + "/" + str(k))
    else:
        assert np.shape(a) == np.shape(b), f"{path}: {np.shape(a)} vs {np.shape(b)}"


def test_resnet18_port_structure_and_forward(rng):
    sd = fake_torchvision_resnet_sd(rng)
    converted = convert_resnet18(sd)

    model = resnet18(include_pool=True, name=None)
    x = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    tree_structure_equal(
        jax.tree.map(np.asarray, dict(variables["params"])), converted["params"]
    )
    tree_structure_equal(
        jax.tree.map(np.asarray, dict(variables["batch_stats"])),
        converted["batch_stats"],
    )
    out = model.apply(
        {"params": converted["params"], "batch_stats": converted["batch_stats"]}, x
    )
    assert out.shape == (2, 512)
    assert np.isfinite(np.asarray(out)).all()


def test_pretrained_checkpoint_bootstrap(rng, tmp_path):
    """Fake torchvision resnet34/18 state dicts -> resumable checkpoint ->
    restore into a fresh train state with ported backbone weights."""
    from svol_tpu.config import DataConfig, ModelConfig, SvolConfig
    from svol_tpu.train.checkpoints import restore_checkpoint
    from svol_tpu.train.state import create_train_state
    from svol_tpu.models import build_model
    from svol_tpu.utils.torch_port import build_pretrained_checkpoint

    T, K, IMG = 2, 2, 64
    cfg = SvolConfig(
        data=DataConfig(num_frames=T, max_boxes_per_frame=K, image_size=IMG),
        model=ModelConfig(hidden_dim=32, nheads=4, num_layers=2,
                          num_queries=T * K, num_queries_per_frame=K,
                          cmt_dim_feedforward=32, compute_dtype="float32"),
    )
    vid_sd = fake_torchvision_resnet_sd(rng, stage_sizes=(3, 4, 6, 3))
    skch_sd = fake_torchvision_resnet_sd(rng, stage_sizes=(2, 2, 2, 2))
    # save as npz (path-based flow)
    vid_path, skch_path = str(tmp_path / "r34.npz"), str(tmp_path / "r18.npz")
    np.savez(vid_path, **vid_sd)
    np.savez(skch_path, **skch_sd)

    ckpt = build_pretrained_checkpoint(cfg, vid_path, skch_path, str(tmp_path))

    model = build_model(cfg)
    sample = {
        "src_sketch": np.zeros((1, 1, IMG, IMG, 3), np.float32),
        "src_video": np.zeros((1, T, IMG, IMG, 3), np.float32),
        "src_sketch_mask": np.ones((1, 1), np.float32),
        "src_video_mask": np.ones((1, T), np.float32),
    }
    state = create_train_state(cfg, model, jax.random.PRNGKey(7), sample)
    state = restore_checkpoint(ckpt, state)
    got = np.asarray(state.params["backbone"]["video_backbone"]["conv1"]["kernel"])
    exp = np.transpose(vid_sd["conv1.weight"], (2, 3, 1, 0))
    np.testing.assert_allclose(got, exp)


def test_hf_vit_port_numeric_parity(rng):
    """Random HF ViTModel -> convert -> our ViT must produce the same
    last_hidden_state (true numeric parity, no downloads)."""
    transformers = pytest.importorskip("transformers")
    torch = pytest.importorskip("torch")

    cfg = transformers.ViTConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, image_size=32, patch_size=16,
    )
    hf = transformers.ViTModel(cfg, add_pooling_layer=False).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    converted = convert_hf_vit(sd, num_layers=2, image_size=32)

    # grafting embeddings sized for a different image_size must fail eagerly
    # with a readable message, not later as an opaque shape error
    with pytest.raises(ValueError, match="position_embeddings"):
        convert_hf_vit(sd, num_layers=2, image_size=224)

    ours = ViT(hidden_size=32, num_layers=2, num_heads=4, mlp_dim=64,
               patch_size=16, image_size=32, name=None)
    x = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    variables = ours.init(jax.random.PRNGKey(0), x)
    tree_structure_equal(
        jax.tree.map(np.asarray, dict(variables["params"])), converted["params"]
    )

    hidden, _ = ours.apply({"params": converted["params"]}, x)
    with torch.no_grad():
        t_out = hf(
            pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(hidden), t_out, atol=2e-4)
