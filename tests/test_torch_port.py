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


def fake_torchvision_resnet18_sd(rng):
    """Random state dict with torchvision resnet18 names/shapes."""
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
        [(2, 64), (2, 128), (2, 256), (2, 512)], start=1
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
    sd = fake_torchvision_resnet18_sd(rng)
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
    converted = convert_hf_vit(sd, num_layers=2)

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
