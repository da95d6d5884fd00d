"""Aux subsystems: profiling, checkpoint/resume, viewer, two-view init."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointslot_tpu.geometry import se3, two_view
from pointslot_tpu.utils.profiling import Profiler


def test_profiler_registry():
    p = Profiler()
    with p.timer("stage_a"):
        sum(range(1000))
    with p.timer("stage_a"):
        sum(range(1000))
    p.count("matches", 42)
    s = p.summary()
    assert s["stages"]["stage_a"]["n"] == 2
    assert s["counters"]["matches"] == 42
    assert s["stages"]["stage_a"]["mean_ms"] >= 0


def test_two_view_reconstruction(rng):
    n = 200
    pts = np.stack([rng.uniform(-4, 4, n), rng.uniform(-2, 2, n),
                    rng.uniform(4, 20, n)], 1)
    T21 = np.asarray(se3.se3_exp(jnp.asarray(
        [0.6, 0.05, 0.05, 0.01, 0.08, 0.01], jnp.float32)))
    p1 = pts[:, :2] / pts[:, 2:3]
    pc2 = pts @ T21[:3, :3].T + T21[:3, 3]
    p2 = pc2[:, :2] / pc2[:, 2:3]
    # add outliers
    p2[:20] += rng.uniform(0.05, 0.2, size=(20, 2))
    res = two_view.reconstruct_two_view(
        jnp.asarray(p1, jnp.float32), jnp.asarray(p2, jnp.float32),
        jnp.ones(n, bool), jax.random.PRNGKey(2),
    )
    assert bool(res.ok)
    # direction of translation must match (scale is free)
    t_est = np.asarray(res.T21[:3, 3])
    t_true = T21[:3, 3]
    cos = np.dot(t_est, t_true) / (np.linalg.norm(t_est) * np.linalg.norm(t_true))
    assert cos > 0.99
    R_err = np.asarray(res.T21[:3, :3]) @ T21[:3, :3].T
    assert np.abs(R_err - np.eye(3)).max() < 0.02


def test_checkpoint_roundtrip(tmp_path):
    from pointslot_tpu.config import SLOTMode, SystemConfig
    from pointslot_tpu.datasets.synthetic import (
        SyntheticRenderer, make_scene, offline_detection_rows,
    )
    from pointslot_tpu.slam.checkpoint import load_checkpoint, save_checkpoint
    from pointslot_tpu.slam.objects import Detection
    from pointslot_tpu.slam.system import System

    scene = make_scene(n_frames=6, n_objects=1, seed=71, forward_speed=0.7)
    renderer = SyntheticRenderer(scene)
    rows = offline_detection_rows(scene)
    cfg = SystemConfig(slot_mode=SLOTMode.OFFLINE)
    cfg = cfg.replace(
        objects=cfg.objects.__class__(
            **{**cfg.objects.__dict__, "init_min_features": 10,
               "init_min_map_points": 8, "min_tracked_points": 8,
               "track_min_features": 10}),
        tracking=cfg.tracking.__class__(
            **{**cfg.tracking.__dict__, "min_init_stereo_features": 350}),
        loop=cfg.loop.__class__(**{**cfg.loop.__dict__, "enabled": False}),
    )
    system = System(cfg)
    for i in range(6):
        left, right, inst = renderer.render(i)
        fr = rows[(rows[:, 0] == i) & (rows[:, 1] >= 0)]
        dets = [Detection.from_row24(r, mask_value=int(r[1]) + 1) for r in fr]
        system.track_stereo(left, right, i * 0.1, i, detections=dets,
                            instance_mask=inst)

    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, system)

    system2 = System(cfg)
    load_checkpoint(path, system2)
    assert system2.map.n_keyframes() == system.map.n_keyframes()
    assert system2.map.n_points() == system.map.n_points()
    np.testing.assert_array_equal(system2.map.kf_pose, system.map.kf_pose)
    np.testing.assert_array_equal(system2.map.pt_pos, system.map.pt_pos)
    t1 = system.camera_trajectory()
    t2 = system2.camera_trajectory()
    assert len(t1) == len(t2)
    for (f1, T1, _), (f2, T2, _) in zip(t1, t2):
        assert f1 == f2
        np.testing.assert_allclose(T1, T2, atol=1e-6)
    if system._object_system is not None:
        a = system._object_system.all_tracks
        b = system2._object_system.all_tracks
        assert len(a) == len(b)
        for ta, tb in zip(a, b):
            assert ta.track_id == tb.track_id
            assert ta.n_points() == tb.n_points()
            np.testing.assert_array_equal(ta.pt_pos, tb.pt_pos)
            assert len(ta.keyframes) == len(tb.keyframes)


def test_viewer_renders(tmp_path):
    from pointslot_tpu.config import SystemConfig
    from pointslot_tpu.datasets.synthetic import SyntheticRenderer, make_scene
    from pointslot_tpu.slam.system import System
    from pointslot_tpu.viz.render import draw_frame, draw_map_topdown, save_png

    scene = make_scene(n_frames=4, n_objects=0, seed=81, forward_speed=0.7)
    renderer = SyntheticRenderer(scene)
    system = System(SystemConfig())
    frame = None
    for i in range(4):
        left, right, _ = renderer.render(i)
        frame = system.track_stereo(left, right, i * 0.1, i)
    overlay = draw_frame(
        left, keypoints=frame.xy, kp_valid=frame.valid,
        kp_bound=frame.point_idx >= 0,
        boxes=[(np.array([100, 100, 80, 60]), 3)],
        status_text="SLOT OK",
    )
    assert overlay.shape == left.shape + (3,)
    topdown = draw_map_topdown(system)
    assert topdown.shape == (800, 800, 3)
    save_png(str(tmp_path / "frame.png"), overlay)
    save_png(str(tmp_path / "map.png"), topdown)
    assert (tmp_path / "map.png").exists()


def test_cuboid_overlay():
    from pointslot_tpu.viz.render import draw_frame_cuboids

    img = np.full((375, 1242), 60, np.uint8)
    T_co = np.eye(4)
    T_co[:3, 3] = [1.0, 0.2, 8.0]
    out = draw_frame_cuboids(
        img, [(T_co, np.array([1.6, 1.5, 3.9]), 4)],
        fx=721.5, fy=721.5, cx=609.6, cy=172.9,
    )
    assert out.shape == (375, 1242, 3)
    assert (out != out[0, 0]).any(), "cuboid wireframe not drawn"
    # behind-camera object draws nothing
    T_back = np.eye(4); T_back[:3, 3] = [0, 0, -5.0]
    out2 = draw_frame_cuboids(
        img, [(T_back, np.array([1.6, 1.5, 3.9]), 4)],
        fx=721.5, fy=721.5, cx=609.6, cy=172.9,
    )
    assert (out2 == np.stack([img] * 3, -1)).all()


def test_compile_cache_enables(tmp_path):
    import jax

    from pointslot_tpu.utils.compile_cache import enable_compile_cache

    d = enable_compile_cache(str(tmp_path / "xla"))
    try:
        assert jax.config.jax_compilation_cache_dir == d
        import os
        assert os.path.isdir(d)
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
