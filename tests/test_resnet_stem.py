"""Space-to-depth stem: exact mathematical equivalence with the 7x7/s2 conv.

The TPU stem (models/resnet.py: stem='space_to_depth') must produce the SAME
network function as the torch-layout conv7 stem once the kernel is rearranged
with conv7_to_s2d_kernel — this is what makes torchvision weight ports
(backbone.py:135-137 semantics) and conv7-trained checkpoints carry over
losslessly.
"""
import jax
import jax.numpy as jnp
import numpy as np

from svol_tpu.models.resnet import (
    conv7_to_s2d_kernel,
    resnet18,
    space_to_depth,
)


def test_conv_stem_equivalence_raw():
    """Direct conv comparison: conv7/s2/p3 on x == conv4/s1/p(2,1) on s2d(x)
    with the rearranged kernel, at several spatial sizes."""
    rng = np.random.default_rng(0)
    for hw in (8, 14, 32):
        x = jnp.asarray(rng.standard_normal((2, hw, hw, 3)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((7, 7, 3, 5)), jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, k, window_strides=(2, 2), padding=[(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        got = jax.lax.conv_general_dilated(
            space_to_depth(x), conv7_to_s2d_kernel(k),
            window_strides=(1, 1), padding=[(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def test_resnet_stems_same_function():
    """Full ResNet-18 forward: init the conv7 model, rearrange conv1 into the
    s2d tree, outputs must match."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)), jnp.float32)

    m7 = resnet18(include_pool=True, stem="conv7", name=None)
    v7 = m7.init(jax.random.PRNGKey(0), x)
    ms = resnet18(include_pool=True, stem="space_to_depth", name=None)
    vs = jax.tree.map(lambda a: a, ms.init(jax.random.PRNGKey(0), x))

    import flax

    vs = flax.core.unfreeze(vs)
    v7u = flax.core.unfreeze(v7)
    params_s = dict(v7u["params"])
    params_s["conv1_s2d"] = {
        "kernel": conv7_to_s2d_kernel(params_s.pop("conv1")["kernel"])
    }
    vs["params"] = params_s
    vs["batch_stats"] = v7u["batch_stats"]

    out7 = m7.apply(v7, x)
    outs = ms.apply(vs, x)
    np.testing.assert_allclose(np.asarray(outs), np.asarray(out7),
                               atol=1e-5, rtol=1e-5)


def test_torch_port_s2d_stem():
    """convert_resnet(stem='space_to_depth') emits the rearranged conv1 under
    the s2d param name, numerically equal to rearranging the conv7 port."""
    from svol_tpu.utils.torch_port import convert_resnet18

    rng = np.random.default_rng(2)
    sd = {"conv1.weight": rng.standard_normal((64, 3, 7, 7)).astype(np.float32),
          "bn1.weight": np.ones(64, np.float32),
          "bn1.bias": np.zeros(64, np.float32),
          "bn1.running_mean": np.zeros(64, np.float32),
          "bn1.running_var": np.ones(64, np.float32)}
    # minimal blocks for resnet18 topology
    chans = [(64, 64), (64, 128), (128, 256), (256, 512)]
    for stage, (cin, cout) in enumerate(chans, start=1):
        for b in range(2):
            ci = cin if b == 0 else cout
            stride_block = stage > 1 and b == 0
            sd[f"layer{stage}.{b}.conv1.weight"] = rng.standard_normal(
                (cout, ci, 3, 3)).astype(np.float32)
            sd[f"layer{stage}.{b}.conv2.weight"] = rng.standard_normal(
                (cout, cout, 3, 3)).astype(np.float32)
            for c in (1, 2):
                p = f"layer{stage}.{b}.bn{c}"
                sd[p + ".weight"] = np.ones(cout, np.float32)
                sd[p + ".bias"] = np.zeros(cout, np.float32)
                sd[p + ".running_mean"] = np.zeros(cout, np.float32)
                sd[p + ".running_var"] = np.ones(cout, np.float32)
            if stride_block:
                sd[f"layer{stage}.{b}.downsample.0.weight"] = (
                    rng.standard_normal((cout, ci, 1, 1)).astype(np.float32))
                p = f"layer{stage}.{b}.downsample.1"
                sd[p + ".weight"] = np.ones(cout, np.float32)
                sd[p + ".bias"] = np.zeros(cout, np.float32)
                sd[p + ".running_mean"] = np.zeros(cout, np.float32)
                sd[p + ".running_var"] = np.ones(cout, np.float32)

    c7 = convert_resnet18(sd)
    cs = convert_resnet18(sd, stem="space_to_depth")
    assert "conv1_s2d" in cs["params"] and "conv1" not in cs["params"]
    np.testing.assert_allclose(
        cs["params"]["conv1_s2d"]["kernel"],
        np.asarray(conv7_to_s2d_kernel(c7["params"]["conv1"]["kernel"])),
    )
