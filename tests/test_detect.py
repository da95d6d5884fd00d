import numpy as np
import jax.numpy as jnp

from pointslot_tpu.detect import deepsort as ds
from pointslot_tpu.detect.yolo import Detector, nms
from pointslot_tpu.detect.reid import ReIDEmbedder
from pointslot_tpu.detect.tracker2d import MultiTracker2D


def test_kalman_tracks_constant_velocity():
    kf = ds.KalmanFilter()
    mean, cov = kf.initiate(np.array([100.0, 50.0, 0.5, 40.0]))
    for i in range(1, 15):
        mean, cov = kf.predict(mean, cov)
        obs = np.array([100.0 + 5 * i, 50.0 + 2 * i, 0.5, 40.0])
        mean, cov = kf.update(mean, cov, obs)
    # velocity estimate should approach (5, 2)
    assert abs(mean[4] - 5.0) < 1.0
    assert abs(mean[5] - 2.0) < 1.0


def test_iou_matrix():
    a = np.array([[0, 0, 10, 10]])
    b = np.array([[0, 0, 10, 10], [5, 0, 10, 10], [20, 20, 5, 5]])
    m = ds.iou_matrix(a, b)
    np.testing.assert_allclose(m[0, 0], 1.0)
    np.testing.assert_allclose(m[0, 1], 50 / 150, atol=1e-6)
    np.testing.assert_allclose(m[0, 2], 0.0)


def test_deepsort_id_stability():
    """Two boxes moving independently keep their ids; a vanished box dies."""
    sort = ds.DeepSort()
    ids_seen = {}
    for f in range(12):
        dets = [{"bbox": np.array([50 + 6 * f, 100, 40, 30]), "score": 0.9,
                 "class_id": 2}]
        if f < 8:
            dets.append({"bbox": np.array([300, 200 + 4 * f, 50, 40]),
                         "score": 0.9, "class_id": 2})
        out = sort.update(dets)
        for t in out:
            key = 0 if t["bbox"][0] < 200 else 1
            ids_seen.setdefault(key, set()).add(t["track_id"])
    assert len(ids_seen[0]) == 1, f"id switch on box 0: {ids_seen[0]}"
    assert len(ids_seen[1]) == 1, f"id switch on box 1: {ids_seen[1]}"
    assert ids_seen[0] != ids_seen[1]


def test_nms_suppresses_same_class_only():
    pred = np.zeros((10, 85), np.float32)
    # two heavily overlapping boxes, same class
    pred[0, :4] = [100, 100, 40, 40]; pred[0, 4] = 0.9; pred[0, 5 + 2] = 0.9
    pred[1, :4] = [102, 102, 40, 40]; pred[1, 4] = 0.8; pred[1, 5 + 2] = 0.9
    # overlapping but different class
    pred[2, :4] = [104, 100, 40, 40]; pred[2, 4] = 0.85; pred[2, 5 + 7] = 0.9
    # far away box
    pred[3, :4] = [400, 200, 30, 30]; pred[3, 4] = 0.7; pred[3, 5 + 2] = 0.9
    boxes, scores, classes, valid = nms(jnp.asarray(pred), 0.3, 0.5, max_out=8)
    kept = [(int(c), float(s)) for c, s, v in
            zip(np.asarray(classes), np.asarray(scores), np.asarray(valid)) if v]
    assert len(kept) == 3
    classes_kept = sorted(c for c, _ in kept)
    assert classes_kept == [2, 2, 7]


def test_yolo_detector_shapes():
    det = Detector(input_size=320, width=8)
    out = det.run(np.random.default_rng(0).integers(0, 255, (192, 320), np.uint8))
    assert isinstance(out, list)
    for d in out:
        assert d["bbox"].shape == (4,)
        assert d["class_id"] in (2, 7)


def test_reid_embedder_normalized():
    emb = ReIDEmbedder(feature_dim=64, max_batch=8)
    img = np.random.default_rng(1).integers(0, 255, (200, 300), np.uint8)
    boxes = np.array([[10, 10, 50, 80], [100, 40, 60, 90]])
    f = emb(img, boxes)
    assert f.shape == (2, 64)
    np.testing.assert_allclose(np.linalg.norm(f, axis=1), 1.0, atol=1e-4)
    f2 = emb(img, boxes)
    np.testing.assert_allclose(f, f2, atol=1e-6)


def test_tracker2d_follows_moving_square(rng):
    tracker = MultiTracker2D()
    tex = rng.uniform(0, 255, size=(60, 60)).astype(np.float32)

    def make_frame(pos):
        img = rng.uniform(0, 40, size=(240, 320)).astype(np.float32)
        x, y = pos
        img[y : y + 60, x : x + 60] = tex
        return img.astype(np.uint8)

    img0 = make_frame((50, 80))
    tracker.add(img0, (50, 80, 60, 60))
    pos = np.array([50, 80])
    for i in range(8):
        pos = pos + np.array([6, 3])
        img = make_frame(tuple(pos))
        live = tracker.update(img)
        assert len(live) == 1, f"track lost at step {i}"
    err = np.abs(live[0].bbox[:2] - pos)
    assert err.max() < 6, f"tracking drift {err}"
