"""ReID embedder training on synthetic identity crops.

The reference ships a pre-trained ReID engine (TensorRT, built from ONNX —
deepsort/src/featuretensor.cpp, deepsortenginegenerator.cpp) and never
trains one. Here the embedder is trainable in-repo: procedural textured
identities rendered under random viewpoint/scale/photometric jitter, a
softmax identity loss over the normalized embedding (standard ReID
training), classifier head discarded at export. The resulting appearance
metric separates identities — which is what the DeepSORT cascade's cosine
gallery needs to survive crossings/occlusions.

Run: ``python -m pointslot_tpu.detect.train_reid [out.npz]``
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pointslot_tpu.detect.reid import CROP_H, CROP_W, ReIDNet


def make_identity_bank(n_ids: int, seed: int = 0, tex: int = 48):
    """Per-identity base texture: smooth random pattern, (n, tex, tex)."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 1, size=(n_ids, 8, 8))
    big = jax.image.resize(jnp.asarray(base), (n_ids, tex, tex), "bicubic")
    return np.asarray(jnp.clip(big, 0, 1))


def _np_resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Host-side bilinear resize (keeps crop sampling off the device)."""
    h, w = img.shape
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0, 1)[:, None]
    wx = np.clip(xs - x0, 0, 1)[None, :]
    a = img[np.ix_(y0, x0)]
    b = img[np.ix_(y0, x1)]
    c = img[np.ix_(y1, x0)]
    d = img[np.ix_(y1, x1)]
    return (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
            + c * wy * (1 - wx) + d * wy * wx)


def sample_crops(bank: np.ndarray, rng: np.random.Generator, batch: int):
    """Random (identity, view) pairs: scaled/shifted/jittered sub-windows
    resized to the ReID crop geometry."""
    n_ids, tex, _ = bank.shape
    ids = rng.integers(0, n_ids, size=batch)
    crops = np.zeros((batch, CROP_H, CROP_W, 1), np.float32)
    for i, k in enumerate(ids):
        s = rng.uniform(0.5, 1.0)
        w = max(int(tex * s), 8)
        h = max(int(tex * s), 8)
        x0 = rng.integers(0, tex - w + 1)
        y0 = rng.integers(0, tex - h + 1)
        win = bank[k, y0 : y0 + h, x0 : x0 + w]
        img = _np_resize_bilinear(win, CROP_H, CROP_W)
        gain = rng.uniform(0.5, 1.4)
        bias = rng.uniform(-0.15, 0.15)
        noise = rng.normal(scale=0.03, size=img.shape)
        crops[i, :, :, 0] = np.clip(img * gain + bias + noise, 0, 1)
    return crops, ids


def train(n_ids: int = 64, steps: int = 800, batch: int = 64,
          feature_dim: int = 128, seed: int = 0, lr: float = 1e-3):
    """Returns (variables, accuracy) — variables are the inference tree
    (params + batch_stats) for ReIDNet; the softmax head is dropped."""
    model = ReIDNet(features=feature_dim)
    rng = np.random.default_rng(seed)
    bank = make_identity_bank(n_ids, seed)
    key = jax.random.PRNGKey(seed)
    dummy = jnp.zeros((1, CROP_H, CROP_W, 1))
    variables = model.init(key, dummy, train=True)
    head = jax.random.normal(key, (feature_dim, n_ids)) * 0.05
    params = {"net": variables["params"], "head": head}
    stats = variables["batch_stats"]

    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state, x, y):
        def loss_fn(p):
            emb, updates = model.apply(
                {"params": p["net"], "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"],
            )
            logits = 16.0 * emb @ p["head"]   # scaled cosine softmax
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, y
            ).mean()
            acc = (jnp.argmax(logits, -1) == y).mean()
            return loss, (updates["batch_stats"], acc)

        (loss, (new_stats, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        upd, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), new_stats, opt_state, loss, acc

    acc = 0.0
    for i in range(steps):
        x, y = sample_crops(bank, rng, batch)
        params, stats, opt_state, loss, acc = step(
            params, stats, opt_state, jnp.asarray(x), jnp.asarray(y)
        )
    return {"params": params["net"], "batch_stats": stats}, float(acc)


def save_npz(path: str, variables: dict):
    import flax

    flat = flax.traverse_util.flatten_dict(variables)
    np.savez(path, **{"/".join(k): np.asarray(v) for k, v in flat.items()})


def load_npz(path: str) -> dict:
    import flax

    flat = dict(np.load(path))
    return flax.traverse_util.unflatten_dict(
        {tuple(k.split("/")): v for k, v in flat.items()}
    )


def main(argv=None):
    out = (argv or sys.argv[1:] or ["pointslot_tpu/detect/weights/synthetic_reid.npz"])[0]
    variables, acc = train()
    save_npz(out, variables)
    print(f"saved {out} (train id-accuracy {acc:.3f})")


if __name__ == "__main__":
    main()
