"""CLI runner end-to-end (stereo_kitti driver analog)."""

import json
import os

import numpy as np


def test_run_synthetic_mode4(tmp_path):
    from pointslot_tpu.run import main

    out = tmp_path / "out"
    rc = main([
        "--synthetic", "6", "--mode", "4", "--out", str(out), "--no-loop",
        "--synthetic-objects", "1",
    ])
    assert rc == 0
    assert (out / "CameraTrajectory.txt").exists()
    assert (out / "ObjectDetections").is_dir()
    stats = json.loads((out / "stats.json").read_text())
    assert stats["frames"] == 6
    assert stats["n_keyframes"] >= 1
    rows = np.loadtxt(out / "CameraTrajectory.txt")
    assert rows.shape[1] == 12
    # camera-and-object trajectory files
    assert (out / "CameraAndObjectTrajectory.txt").exists()
    # camera-frame object poses (SaveObjectDetectionResultsInCameraFrame
    # analog) feed the built-in object evaluator
    assert (out / "ObjectPosesCF.txt").exists()
    # built-in evaluation: synthetic runs score themselves against scene GT
    ev = stats["evaluation"]
    assert ev["camera"]["ate"]["rmse"] < 0.5
    assert ev["camera"]["rpe"]["n"] >= 1
    assert ev["objects"]["n_gt"] > 0


def test_gba_path_runs(tmp_path):
    """Global BA after loop correction executes and keeps the map sane."""
    from pointslot_tpu.config import SystemConfig
    from pointslot_tpu.datasets.synthetic import SyntheticRenderer, make_scene
    from pointslot_tpu.slam.system import System

    scene = make_scene(n_frames=8, n_objects=0, seed=95, forward_speed=0.7)
    renderer = SyntheticRenderer(scene)
    cfg = SystemConfig()
    system = System(cfg)
    for i in range(8):
        left, right, _ = renderer.render(i)
        system.track_stereo(left, right, i * 0.1, i)
    n_pts_before = system.map.n_points()
    # invoke the GBA path directly (loop closure rarely fires on short
    # runs): snapshot -> lock-free solve -> merge-back
    kf0 = int(system.map.keyframe_ids()[0])
    lc = system.loop_closer
    snap = lc._gba_snapshot(kf0)
    assert snap is not None
    result, stats = lc._gba_solve(snap)
    lc._gba_merge(snap, result)
    lc.last_gba_stats = stats
    assert system.map.n_points() == n_pts_before
    # poses stay finite and close to their pre-BA values on clean data
    for k in system.map.keyframe_ids():
        assert np.all(np.isfinite(system.map.kf_pose[k]))
    traj = system.camera_trajectory()
    errs = [
        np.linalg.norm(np.linalg.inv(T)[:3, 3] - scene.poses_world[f][:3, 3])
        for f, T, _ in traj
    ]
    assert float(np.sqrt(np.mean(np.square(errs)))) < 0.2


def test_cli_viz_outputs(tmp_path):
    """--viz N writes frame overlays and a final top-down map."""
    from pointslot_tpu import run as run_mod

    out = tmp_path / "vizout"
    rc = run_mod.main([
        "--synthetic", "6", "--mode", "4", "--out", str(out),
        "--viz", "2", "--no-loop",
    ])
    assert rc == 0
    pngs = sorted((out / "viz").glob("frame_*.png"))
    assert len(pngs) == 3, [p.name for p in pngs]
    assert (out / "map_topdown.png").exists()


def test_cli_checkpoint_roundtrip(tmp_path):
    """--save-checkpoint then --resume continues the run (SaveMap/LoadMap
    role; the reference never implemented its TODO)."""
    from pointslot_tpu import run as run_mod

    ckpt = tmp_path / "state.npz"
    out1 = tmp_path / "o1"
    rc = run_mod.main([
        "--synthetic", "8", "--mode", "0", "--out", str(out1),
        "--max-frames", "5", "--save-checkpoint", str(ckpt), "--no-loop",
    ])
    assert rc == 0 and ckpt.exists()

    out2 = tmp_path / "o2"
    rc = run_mod.main([
        "--synthetic", "8", "--mode", "0", "--out", str(out2),
        "--resume", str(ckpt), "--no-loop",
    ])
    assert rc == 0
    import json

    stats = json.loads((out2 / "stats.json").read_text())
    # the resumed run starts from the checkpointed map, not from scratch
    assert stats["n_keyframes"] >= 1
