"""Virtual KITTI 2 on-disk fixture driven through VirtualKittiSequence
(reference VKITTI support: rgb_%05d.jpg image naming
Examples/Stereo/stereo_kitti.cc:228-235, pose.txt/bbox.txt readers
src/Tracking.cc:650-843, extrinsic.txt camera GT :845)."""

import numpy as np
import pytest

from pointslot_tpu.config import CameraConfig
from pointslot_tpu.datasets.synthetic import (
    SyntheticRenderer, make_scene, offline_detection_rows,
)

N_FRAMES = 3


@pytest.fixture(scope="module")
def vkitti_root(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("vkitti_scene")
    cam = CameraConfig(width=512, height=256, fx=300.0, fy=300.0,
                       cx=256.0, cy=128.0, bf=60.0)
    scene = make_scene(n_frames=N_FRAMES, camera=cam, n_points=1500,
                       n_objects=2, seed=5, forward_speed=0.4)
    renderer = SyntheticRenderer(scene)
    rows = offline_detection_rows(scene)

    left = root / "frames" / "rgb" / "Camera_0"
    right = root / "frames" / "rgb" / "Camera_1"
    inst_d = root / "frames" / "instanceSegmentation" / "Camera_0"
    for d in (left, right, inst_d):
        d.mkdir(parents=True)
    for i in range(N_FRAMES):
        li, ri, inst = renderer.render(i)
        Image.fromarray(np.asarray(li, np.uint8)).save(
            left / f"rgb_{i:05d}.jpg")
        Image.fromarray(np.asarray(ri, np.uint8)).save(
            right / f"rgb_{i:05d}.jpg")
        raw = np.where(inst > 0, 100 + inst.astype(np.int32), 0)
        Image.fromarray(raw.astype(np.uint16)).save(
            inst_d / f"instancegt_{i:05d}.png")

    # pose.txt / bbox.txt in the VKITTI 2 column layouts (see
    # datasets.kitti.read_virtual_kitti_objects docstring)
    pose_lines = ["frame cameraID trackID alpha width height length wx wy wz "
                  "r_wy r_wx r_wz cx cy cz r_cy r_cx r_cz"]
    bbox_lines = ["frame cameraID trackID left right top bottom pixels "
                  "truncation occlusion isMoving"]
    for r in rows:
        if r[1] < 0:
            continue
        length, height, width = r[9], r[10], r[11]
        cx, cy, cz = r[12], r[13] + height / 2.0, r[14]
        pose_lines.append(
            f"{int(r[0])} 0 {int(r[1])} {r[4]:.6f} {width:.3f} {height:.3f} "
            f"{length:.3f} 0 0 0 0 0 0 {cx:.6f} {cy:.6f} {cz:.6f} "
            f"{r[15]:.6f} 0 0"
        )
        x0, y0, w, h = r[5:9]
        bbox_lines.append(
            f"{int(r[0])} 0 {int(r[1])} {x0:.1f} {x0 + w:.1f} {y0:.1f} "
            f"{y0 + h:.1f} {int(w * h)} 0 0 True"
        )
    (root / "pose.txt").write_text("\n".join(pose_lines) + "\n")
    (root / "bbox.txt").write_text("\n".join(bbox_lines) + "\n")

    ext = ["frame cameraID r1,1 r1,2 r1,3 t1 r2,1 r2,2 r2,3 t2 r3,1 r3,2 "
           "r3,3 t3 0 0 0 1"]
    for i in range(N_FRAMES):
        T = np.linalg.inv(scene.poses_world[i])  # world -> camera
        ext.append(f"{i} 0 " + " ".join(f"{v:.9f}" for v in T.reshape(-1)))
        ext.append(f"{i} 1 " + " ".join("0" for _ in range(16)))
    (root / "extrinsic.txt").write_text("\n".join(ext) + "\n")
    return root, scene, rows


def test_vkitti_sequence_loads(vkitti_root):
    from pointslot_tpu.datasets.kitti import VirtualKittiSequence

    root, scene, rows = vkitti_root
    seq = VirtualKittiSequence(str(root))
    assert len(seq) == N_FRAMES
    assert seq.stereo
    left, right, dets, inst = seq.load(0)
    assert left.shape == (256, 512)
    assert right.shape == (256, 512)
    n_gt = int(((rows[:, 0] == 0) & (rows[:, 1] >= 0)).sum())
    assert len(dets) == n_gt
    # locations round-trip through the bottom-face-origin shift
    r0 = rows[(rows[:, 0] == 0) & (rows[:, 1] >= 0)][0]
    d0 = next(d for d in dets if d.track_id == int(r0[1]))
    np.testing.assert_allclose(d0.location_cam, r0[12:15], atol=1e-3)
    # instance mask re-normalized onto detection mask values
    assert inst is not None
    vals = set(np.unique(inst).tolist()) - {0}
    assert vals <= {d.mask_value for d in dets}
    assert len(vals) >= 1


def test_vkitti_camera_gt(vkitti_root):
    from pointslot_tpu.datasets.kitti import VirtualKittiSequence

    root, scene, _ = vkitti_root
    seq = VirtualKittiSequence(str(root))
    assert seq.gt_poses is not None and len(seq.gt_poses) == N_FRAMES
    T0 = np.linalg.inv(scene.poses_world[1])
    np.testing.assert_allclose(seq.gt_poses[1], T0, atol=1e-6)


def test_vkitti_cli_flag_parses(vkitti_root, tmp_path):
    """--dataset vkitti routes the CLI to the VKITTI loader."""
    from pointslot_tpu import run as run_mod

    root, _, _ = vkitti_root

    class _Args:
        data = str(root)
        dataset = "vkitti"
        sequence = "0000"

    from pointslot_tpu.config import CameraConfig as CC, SystemConfig

    cfg = SystemConfig().replace(
        camera=CC(width=512, height=256, fx=300.0, fy=300.0,
                  cx=256.0, cy=128.0, bf=60.0),
        slot_mode=4,
    )
    gen, eval_ctx = run_mod._kitti_frames(_Args(), cfg)
    frames = list(gen)
    assert len(frames) == N_FRAMES
    assert "gt_poses" in eval_ctx
    fid, ts, left, right, dets, inst, flow = frames[0]
    assert fid == 0 and dets and inst is not None and flow is None
