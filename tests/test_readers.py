"""Dataset reader formats: Virtual KITTI, KITTI poses, BoW text vocab."""

import numpy as np

from pointslot_tpu.datasets.kitti import (
    read_kitti_poses,
    read_virtual_kitti_objects,
)
from pointslot_tpu.vocab.bow import BinaryVocabulary, load_orb_vocab_text


def test_read_kitti_poses(tmp_path):
    T = np.eye(4)
    T[:3, 3] = [1.0, 2.0, 3.0]
    rows = [np.eye(4)[:3, :4].reshape(-1), T[:3, :4].reshape(-1)]
    p = tmp_path / "pose.txt"
    np.savetxt(p, np.stack(rows))
    out = read_kitti_poses(str(p))
    assert out.shape == (2, 4, 4)
    np.testing.assert_allclose(out[1][:3, 3], [1, 2, 3])
    np.testing.assert_allclose(out[0], np.eye(4))


def test_read_virtual_kitti(tmp_path):
    pose = tmp_path / "pose.txt"
    bbox = tmp_path / "bbox.txt"
    pose.write_text(
        "frame cameraID trackID alpha width height length wx wy wz ry rx rz cx cy cz cry crx crz\n"
        "0 0 5 0.1 1.6 1.5 3.5 10 0 20 0.2 0 0 2.0 1.0 15.0 0.3 0 0\n"
        "0 1 5 0.1 1.6 1.5 3.5 10 0 20 0.2 0 0 2.0 1.0 15.0 0.3 0 0\n"
    )
    bbox.write_text(
        "frame cameraID trackID left right top bottom pixels trunc occ isMoving\n"
        "0 0 5 100 200 50 120 5000 0.0 0.9 True\n"
        "0 1 5 100 200 50 120 5000 0.0 0.9 True\n"
    )
    rows = read_virtual_kitti_objects(str(pose), str(bbox))
    assert rows.shape == (1, 24)  # camera 1 dropped
    r = rows[0]
    assert r[0] == 0 and r[1] == 5
    np.testing.assert_allclose(r[5:9], [100, 50, 100, 70])
    np.testing.assert_allclose(r[9:12], [3.5, 1.5, 1.6])  # l, h, w
    # bottom-center -> geometric center shift
    np.testing.assert_allclose(r[12:15], [2.0, 1.0 - 0.75, 15.0])
    assert r[18] == 1.0


def test_bow_text_vocab_roundtrip(tmp_path, rng):
    # write a tiny DBoW2-text-format vocabulary: k L s1 s2 then nodes
    words = rng.integers(0, 256, size=(8, 32), dtype=np.uint8)
    lines = ["4 1 0 0"]
    for i, w in enumerate(words):
        lines.append("0 1 " + " ".join(str(x) for x in w) + f" {0.5 + i * 0.01}")
    p = tmp_path / "voc.txt"
    p.write_text("\n".join(lines) + "\n")
    vocab = load_orb_vocab_text(str(p))
    assert vocab.n_words == 8
    np.testing.assert_allclose(vocab.idf, 0.5 + np.arange(8) * 0.01, atol=1e-6)
    # word assignment: a descriptor equal to word 3 maps to word 3
    desc = words[3].view(np.uint32)[None, :]
    _, wid = vocab.transform(desc, np.ones(1, bool))
    assert int(wid[0]) == 3


def test_read_mynteye(tmp_path):
    from pointslot_tpu.datasets.kitti import read_mynteye_object_rows

    p = tmp_path / "obj.txt"
    p.write_text("0 10 20 50 40\n1 12 21 50 40\n")
    rows = read_mynteye_object_rows(str(p), dims=(1.0, 2.0, 3.0),
                                    location=(0.5, 0.0, 4.0))
    assert rows.shape == (2, 24)
    np.testing.assert_allclose(rows[0][5:9], [10, 20, 50, 40])
    np.testing.assert_allclose(rows[1][0], 1)
    np.testing.assert_allclose(rows[0][9:12], [1.0, 2.0, 3.0])
    np.testing.assert_allclose(rows[0][12:15], [0.5, 0.0, 4.0])


def test_save_object_poses_camera_frame(tmp_path):
    from pointslot_tpu.config import SLOTMode, SystemConfig
    from pointslot_tpu.slam.objects import ObjectTrack
    from pointslot_tpu.slam.system import System

    cfg = SystemConfig(slot_mode=SLOTMode.OFFLINE)
    cfg = cfg.replace(loop=cfg.loop.__class__(
        **{**cfg.loop.__dict__, "enabled": False}))
    system = System(cfg)
    t = ObjectTrack(track_id=7, dims=np.array([3.0, 1.5, 1.6]), max_points=8)
    T = np.eye(4); T[:3, 3] = [1, 2, 10]
    t.poses_cf[3] = T
    system._object_system.all_tracks.append(t)
    path = tmp_path / "obj_cam.txt"
    system.save_object_poses_camera_frame(str(path))
    parts = path.read_text().split()
    assert int(parts[0]) == 3 and int(parts[1]) == 7
    vals = np.asarray([float(v) for v in parts[2:14]]).reshape(3, 4)
    np.testing.assert_allclose(vals, T[:3, :4], atol=1e-8)


def test_prefetch_order_and_overlap():
    """Prefetcher yields strictly in order and overlaps loads."""
    import threading
    import time as _t

    from pointslot_tpu.datasets.prefetch import prefetch

    lock = threading.Lock()
    active = [0]
    peak = [0]

    def load(i):
        with lock:
            active[0] += 1
            peak[0] = max(peak[0], active[0])
        _t.sleep(0.03)
        with lock:
            active[0] -= 1
        return i * 10

    out = list(prefetch(load, 12, depth=4, workers=3))
    assert out == [i * 10 for i in range(12)]
    assert peak[0] >= 2, "loads never overlapped"


def test_prefetch_propagates_errors():
    from pointslot_tpu.datasets.prefetch import prefetch

    def load(i):
        if i == 3:
            raise ValueError("boom")
        return i

    import pytest

    with pytest.raises(ValueError, match="boom"):
        list(prefetch(load, 6, depth=2, workers=2))


def test_prefetch_empty_and_single():
    from pointslot_tpu.datasets.prefetch import prefetch

    assert list(prefetch(lambda i: i, 0)) == []
    assert list(prefetch(lambda i: i, 1)) == [0]


def test_kitti_raw_layout(tmp_path):
    """KITTI raw layout <root>/image_02/data/%010d.png (reference
    stereo_kitti.cc:237-243) resolves through KittiTrackingSequence."""
    from PIL import Image

    from pointslot_tpu.datasets.kitti import KittiTrackingSequence

    for cam in ("image_02", "image_03"):
        d = tmp_path / cam / "data"
        d.mkdir(parents=True)
        for i in range(2):
            Image.fromarray(np.zeros((64, 96), np.uint8)).save(
                d / f"{i:010d}.png")
    seq = KittiTrackingSequence(str(tmp_path))
    assert len(seq) == 2
    left, right, dets, inst = seq.load(1)
    assert left.shape == (64, 96) and dets == [] and inst is None
