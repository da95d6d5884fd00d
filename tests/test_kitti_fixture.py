"""CLI integration on an on-disk fixture in exact KITTI-tracking layout
(VERDICT r1 item 9): images, label_02 detections, instance PNGs and a
reference-schema YAML are written to disk and driven through
`python -m pointslot_tpu.run --data ... --mode 4` (in-process main), so a
real data mount is a path change, not a debugging session.

Layout matched to the reference's loaders (stereo_kitti.cc LoadImages
:175-245, Tracking::ReadKittiObjectInfo src/Tracking.cc:485-640,
instance PNGs src/Frame.cc:687-692)."""

import json
import os

import numpy as np
import pytest

from pointslot_tpu.config import CameraConfig
from pointslot_tpu.datasets.synthetic import (
    SyntheticRenderer, make_scene, offline_detection_rows,
)

N_FRAMES = 4
_TYPES = {1.0: "Car"}


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("kitti_tracking")
    cam = CameraConfig(width=512, height=256, fx=300.0, fy=300.0,
                       cx=256.0, cy=128.0, bf=60.0)
    scene = make_scene(n_frames=N_FRAMES, camera=cam, n_points=2500,
                       n_objects=2, seed=5, forward_speed=0.4)
    renderer = SyntheticRenderer(scene)
    rows = offline_detection_rows(scene)

    left_dir = root / "image_02" / "0000"
    right_dir = root / "image_03" / "0000"
    inst_dir = root / "instances" / "0000"
    label_dir = root / "label_02"
    for d in (left_dir, right_dir, inst_dir, label_dir):
        d.mkdir(parents=True)

    for i in range(N_FRAMES):
        left, right, inst = renderer.render(i)
        name = f"{i:06d}.png"
        Image.fromarray(np.asarray(left, np.uint8)).save(left_dir / name)
        Image.fromarray(np.asarray(right, np.uint8)).save(right_dir / name)
        # raw instance ids in MOTS style (class*1000 + instance); the
        # loader re-normalizes them onto detection rows by bbox IoU
        raw = np.where(inst > 0, 2000 + inst.astype(np.int32), 0).astype(np.uint16)
        Image.fromarray(raw).save(inst_dir / name)

    # KITTI tracking label format: frame track type trunc occ alpha
    # x0 y0 x1 y1 h w l X Y Z rot_y — Y is the 3D-box BOTTOM-center
    # (= geometric center + h/2 in camera coords), per the KITTI spec;
    # the reader shifts back to the geometric center
    lines = []
    for r in rows:
        if r[1] < 0:
            continue
        x0, y0, w, h = r[5:9]
        lines.append(
            f"{int(r[0])} {int(r[1])} Car {r[2]:.2f} {int(r[3])} {r[4]:.6f} "
            f"{x0:.2f} {y0:.2f} {x0 + w:.2f} {y0 + h:.2f} "
            f"{r[10]:.2f} {r[11]:.2f} {r[9]:.2f} "
            f"{r[12]:.6f} {r[13] + r[10] / 2.0:.6f} {r[14]:.6f} {r[15]:.6f}"
        )
    (label_dir / "0000.txt").write_text("\n".join(lines) + "\n")

    (root / "calib.yaml").write_text(
        "%YAML:1.0\n"
        f"Camera.fx: {cam.fx}\nCamera.fy: {cam.fy}\n"
        f"Camera.cx: {cam.cx}\nCamera.cy: {cam.cy}\n"
        f"Camera.width: {cam.width}\nCamera.height: {cam.height}\n"
        f"Camera.bf: {cam.bf}\nCamera.fps: 10.0\n"
        "SLOT.MODE: 4\n"
        "ORBextractor.nFeatures: 1000\n"
        "Tracking.MinInitStereoFeatures: 300\n"
    )
    return root


def test_loader_reads_fixture(kitti_root):
    from pointslot_tpu.datasets.kitti import KittiTrackingSequence

    seq = KittiTrackingSequence(str(kitti_root), "0000")
    assert len(seq) == N_FRAMES
    left, right, dets, inst = seq.load(0)
    assert left.shape == (256, 512) and right.shape == (256, 512)
    assert len(dets) >= 1
    assert inst is not None and inst.max() >= 1
    # mask values line up with detection rows
    for det in dets:
        assert (inst == det.mask_value).sum() > 50


def test_cli_mode4_on_fixture(kitti_root, tmp_path):
    from pointslot_tpu import run as cli

    out = tmp_path / "out"
    rc = cli.main([
        "--data", str(kitti_root), "--sequence", "0000",
        "--config", str(kitti_root / "calib.yaml"),
        "--mode", "4", "--out", str(out), "--no-loop",
    ])
    assert rc == 0
    traj = (out / "CameraTrajectory.txt").read_text().strip().splitlines()
    assert len(traj) == N_FRAMES
    assert all(len(line.split()) == 12 for line in traj)
    stats = json.loads((out / "stats.json").read_text())
    assert stats["frames"] == N_FRAMES
    assert stats["n_keyframes"] >= 1
    det_dir = out / "ObjectDetections"
    assert sorted(os.listdir(det_dir)) == [f"{i:06d}.txt" for i in range(N_FRAMES)]
    # at least one frame carries a tracked object in KITTI 3D-det format
    n_det_lines = sum(
        len((det_dir / f).read_text().strip().splitlines())
        for f in os.listdir(det_dir)
        if (det_dir / f).read_text().strip()
    )
    assert n_det_lines >= 1
