"""Sketch-ViT finetuning + feature extraction (TPU-native).

Port of preprocess/sketch_vit_finetune.py + sketch_vit_feature_extractor.py:
finetune the last k encoder blocks (+ final LayerNorm + classifier) of a
ViT-B/16 as a sketch classifier (19/21/24 classes per sketch dataset), then
dump per-sketch 768-d features — {before,after}-final-norm x {CLS token,
patch mean} — over 5 independently augmented passes per sketch
(sketch_vit_finetune.py:43-159, 162-228).

Rebuilt as a jit'd optax loop with partition-frozen parameters
(optax.multi_transform replaces requires_grad toggling) and numpy/cv2
augmentations replacing albumentations (hflip/vflip/rot90/transpose/elastic,
each p=0.2). Features are saved as .npy instead of torch .pt.

CLI:
  python -m svol_tpu.preprocess.sketch_vit finetune --root ... --dataset sketchy
  python -m svol_tpu.preprocess.sketch_vit extract --root ... --ckpt ... --save_dir ...
"""
from __future__ import annotations

import argparse
import os
import random
from glob import glob
from typing import List, Tuple

import numpy as np

NUM_LABELS = {"sketchy": 19, "tu_berlin": 21, "quickdraw": 24}


# ---------------------------------------------------------------------------
# augmentations (albumentations-equivalent, numpy/cv2)
# ---------------------------------------------------------------------------

def augment(img: np.ndarray, rng: random.Random, p: float = 0.2) -> np.ndarray:
    """img: (H, W, C) uint8."""
    import cv2

    if rng.random() < p:
        img = img[:, ::-1]  # horizontal flip
    if rng.random() < p:
        img = img[::-1, :]  # vertical flip
    if rng.random() < p:
        img = np.rot90(img, rng.randrange(1, 4))
    if rng.random() < p:
        img = np.transpose(img, (1, 0, 2))
    if rng.random() < p:  # elastic transform (border replicate)
        h, w = img.shape[:2]
        alpha, sigma = 34.0, 5.0
        seed = rng.randrange(2**31)
        nprng = np.random.default_rng(seed)
        dx = cv2.GaussianBlur(
            nprng.uniform(-1, 1, (h, w)).astype(np.float32), (0, 0), sigma
        ) * alpha
        dy = cv2.GaussianBlur(
            nprng.uniform(-1, 1, (h, w)).astype(np.float32), (0, 0), sigma
        ) * alpha
        x, y = np.meshgrid(np.arange(w, dtype=np.float32),
                           np.arange(h, dtype=np.float32))
        img = cv2.remap(img, x + dx, y + dy, interpolation=cv2.INTER_LINEAR,
                        borderMode=cv2.BORDER_REPLICATE)
    return np.ascontiguousarray(img)


# ---------------------------------------------------------------------------
# data
# ---------------------------------------------------------------------------

def list_image_folder(root: str) -> Tuple[List[Tuple[str, int]], List[str]]:
    """(path, label) pairs + class names, torch ImageFolder conventions."""
    classes = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    items = []
    for label, cname in enumerate(classes):
        for f in sorted(glob(os.path.join(root, cname, "*"))):
            items.append((f, label))
    return items, classes


def _load(path: str, size: int = 224) -> np.ndarray:
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    img = cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def _to_model_input(img: np.ndarray) -> np.ndarray:
    """uint8 HWC -> float32 in [-1, 1] (ViTFeatureExtractor scaling)."""
    return (img.astype(np.float32) / 255.0 - 0.5) / 0.5


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------

def build_classifier(num_labels: int):
    import flax.linen as nn

    from svol_tpu.models.vit import ViT

    class SketchViT(nn.Module):
        @nn.compact
        def __call__(self, images, deterministic: bool = True):
            hidden, pre_ln = ViT(name="vit")(images, deterministic=deterministic)
            logits = nn.Dense(num_labels, name="classifier")(hidden[:, 0])
            return pre_ln, hidden, logits

    return SketchViT()


def finetune_partition(params, finetune_layers: int, num_vit_layers: int = 12):
    """Label each param 'train' (last k blocks + final LN + classifier) or
    'frozen' (embeddings + earlier blocks), sketch_vit_finetune.py:56-69."""
    import jax

    trainable_layers = {
        f"layer{i}" for i in range(num_vit_layers - finetune_layers, num_vit_layers)
    }

    def label(path, _):
        keys = [getattr(k, "key", str(k)) for k in path]
        if keys[0] == "classifier":
            return "train"
        if keys[0] == "vit":
            if keys[1] in trainable_layers or keys[1] == "ln_final":
                return "train"
        return "frozen"

    return jax.tree_util.tree_map_with_path(label, params)


def finetune(
    root_dir: str,
    dataset: str = "sketchy",
    finetune_layers: int = 1,
    lr: float = 1e-4,
    wd: float = 1e-4,
    epochs: int = 20,
    batch_size: int = 32,
    seed: int = 0,
    save_path: str = "sketch_vit_flax.ckpt",
    print_interval: int = 50,
    max_steps: int = -1,
):
    """Finetune loop (sketch_vit_finetune.py:88-159). Returns final params."""
    import jax
    import jax.numpy as jnp
    import optax
    import orbax.checkpoint as ocp

    model = build_classifier(NUM_LABELS[dataset])
    items, classes = list_image_folder(root_dir)
    assert len(classes) == NUM_LABELS[dataset], (len(classes), dataset)

    rng = random.Random(seed)
    init_imgs = jnp.zeros((1, 224, 224, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(seed), init_imgs)["params"]

    tx = optax.multi_transform(
        {"train": optax.adamw(lr, weight_decay=wd), "frozen": optax.set_to_zero()},
        finetune_partition(params, finetune_layers),
    )
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, images, labels):
        def loss_fn(p):
            _, _, logits = model.apply({"params": p}, images)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    step_i = 0
    for epoch in range(epochs):
        order = list(range(len(items)))
        rng.shuffle(order)
        for start in range(0, len(order) - batch_size + 1, batch_size):
            idxs = order[start : start + batch_size]
            imgs = np.stack([
                _to_model_input(augment(_load(items[i][0]), rng))
                for i in idxs
            ])
            labels = np.array([items[i][1] for i in idxs], np.int32)
            params, opt_state, loss = step(params, opt_state, imgs, labels)
            step_i += 1
            if step_i % print_interval == 0:
                print(f"[{epoch + 1}/{epochs}|step {step_i}] loss {float(loss):.4f}")
            if 0 < max_steps <= step_i:
                break
        if 0 < max_steps <= step_i:
            break

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(save_path), {"params": params}, force=True)
    ckptr.wait_until_finished()
    return params


def extract_features(
    root_dir: str,
    save_dir: str,
    dataset: str = "sketchy",
    params=None,
    ckpt_path: str = "",
    passes: int = 5,
    seed: int = 0,
) -> int:
    """Dump per-sketch features over ``passes`` augmented views
    (sketch_vit_finetune.py:162-206): {before,after}_norm x
    {class_token, feature_avg} as .npy."""
    import jax
    import orbax.checkpoint as ocp

    model = build_classifier(NUM_LABELS[dataset])
    if params is None:
        restored = ocp.StandardCheckpointer().restore(os.path.abspath(ckpt_path))
        params = restored["params"]

    items, classes = list_image_folder(root_dir)
    for cname in classes:
        for norm in ("before_norm", "after_norm"):
            for feat in ("class_token", "feature_avg"):
                os.makedirs(os.path.join(save_dir, norm, feat, cname), exist_ok=True)

    apply = jax.jit(lambda p, x: model.apply({"params": p}, x))
    rng = random.Random(seed)
    counts = {c: 0 for c in classes}
    for _ in range(passes):
        for path, label in items:
            img = _to_model_input(augment(_load(path), rng))[None]
            pre_ln, hidden, _ = apply(params, img)
            pre_ln, hidden = np.asarray(pre_ln[0]), np.asarray(hidden[0])
            cname = classes[label]
            counts[cname] += 1
            i = counts[cname]
            for norm, feats in (("before_norm", pre_ln), ("after_norm", hidden)):
                np.save(
                    os.path.join(save_dir, norm, "class_token", cname,
                                 f"{cname}_{i}.npy"),
                    feats[0],
                )
                np.save(
                    os.path.join(save_dir, norm, "feature_avg", cname,
                                 f"{cname}_{i}.npy"),
                    feats[1:].mean(0),
                )
    return sum(counts.values())


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="sketch ViT finetune / extract")
    sub = p.add_subparsers(dest="cmd", required=True)
    f = sub.add_parser("finetune")
    f.add_argument("--root", required=True)
    f.add_argument("--dataset", default="sketchy", choices=list(NUM_LABELS))
    f.add_argument("--finetune_layers", type=int, default=1)
    f.add_argument("--lr", type=float, default=1e-4)
    f.add_argument("--wd", type=float, default=1e-4)
    f.add_argument("--epochs", type=int, default=20)
    f.add_argument("--save_path", default="sketch_vit_flax.ckpt")
    e = sub.add_parser("extract")
    e.add_argument("--root", required=True)
    e.add_argument("--dataset", default="sketchy", choices=list(NUM_LABELS))
    e.add_argument("--ckpt", required=True)
    e.add_argument("--save_dir", required=True)
    args = p.parse_args(argv)

    if args.cmd == "finetune":
        finetune(args.root, args.dataset, args.finetune_layers, args.lr,
                 args.wd, args.epochs, save_path=args.save_path)
    else:
        n = extract_features(args.root, args.save_dir, args.dataset,
                             ckpt_path=args.ckpt)
        print(f"extracted {n} feature sets")


if __name__ == "__main__":
    main()
