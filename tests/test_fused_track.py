"""The fused one-dispatch tracking step must reproduce the staged
tracker's behavior: driven over a synthetic sequence with a frozen map, the
returned poses must stay near ground truth."""

import numpy as np
import jax.numpy as jnp

from pointslot_tpu.config import CameraConfig, SystemConfig
from pointslot_tpu.datasets.synthetic import SyntheticRenderer, make_scene
from pointslot_tpu.ops.fused_track import FusedObjectPhase, FusedTrackStep
from pointslot_tpu.slam.system import System


def _build_map(system, renderer, scene, n_boot):
    for i in range(n_boot):
        left, right, _ = renderer.render(i)
        system.track_stereo(left, right, timestamp=i * 0.1, frame_id=i)
    m = system.map
    pts = np.nonzero(m.pt_valid)[0]
    M = 2048
    pos = np.zeros((M, 3), np.float32)
    desc = np.zeros((M, 8), np.uint32)
    level = np.zeros(M, np.int32)
    valid = np.zeros(M, bool)
    n = min(len(pts), M)
    pos[:n] = m.pt_pos[pts[:n]]
    desc[:n] = m.pt_desc[pts[:n]]
    valid[:n] = True
    return pos, desc, level, valid


def test_fused_step_tracks_sequence():
    cam = CameraConfig(width=512, height=256, fx=300.0, fy=300.0,
                       cx=256.0, cy=128.0, bf=60.0)
    cfg = SystemConfig()
    cfg = cfg.replace(
        camera=cam,
        tracking=cfg.tracking.__class__(
            **{**cfg.tracking.__dict__, "min_init_stereo_features": 150}),
    )
    scene = make_scene(n_frames=12, camera=cam, n_points=2500, n_objects=0,
                       seed=11, forward_speed=0.4)
    renderer = SyntheticRenderer(scene)
    system = System(cfg)
    n_boot = 4
    pos, desc, level, valid = _build_map(system, renderer, scene, n_boot)
    assert valid.sum() > 300

    step = FusedTrackStep(cfg)
    T = jnp.asarray(system.tracker.last_frame.T_cw, jnp.float32)
    vel = jnp.asarray(
        system.tracker.velocity
        if system.tracker.velocity is not None else np.eye(4, dtype=np.float32)
    )
    gt0 = np.linalg.inv(scene.poses_world[n_boot - 1])
    # the bootstrap trajectory is anchored at frame 0's GT pose
    A = scene.poses_world[0]
    for i in range(n_boot, scene.n_frames):
        left, right, _ = renderer.render(i)
        r = step(left, right, T, vel, pos, desc, level, valid)
        T, vel = r.T_cw, r.velocity
        assert int(r.n_inliers) > 30, f"frame {i}: {int(r.n_inliers)} inliers"
        T_gt = np.linalg.inv(A @ scene.poses_world[i])
        err = np.linalg.norm(np.asarray(T)[:3, 3] - T_gt[:3, 3])
        assert err < 0.25, f"frame {i}: {err:.3f} m off GT (fused)"


def test_fused_object_phase_recovers_pose():
    """Batched object phase: given object-frame points and a perturbed
    initial T_co, the solve must recover the true object pose from the
    frame's features."""
    rng = np.random.default_rng(3)
    cam = CameraConfig(width=512, height=256, fx=300.0, fy=300.0,
                       cx=256.0, cy=128.0, bf=60.0)
    cfg = SystemConfig().replace(camera=cam)

    O, Mo, N = 2, 128, 512
    obj_pos = np.zeros((O, Mo, 3), np.float32)
    obj_desc = rng.integers(0, 2 ** 32, size=(O, Mo, 8), dtype=np.uint32)
    obj_valid = np.ones((O, Mo), bool)
    T_true = []
    feat_xy = np.zeros((N, 2), np.float32)
    feat_desc = np.zeros((N, 8), np.uint32)
    feat_depth = np.full(N, -1.0, np.float32)
    feat_uright = np.full(N, -1.0, np.float32)
    feat_level = np.zeros(N, np.int32)
    feat_valid = np.zeros(N, bool)
    fi = 0
    for o in range(O):
        pts = rng.uniform(-1.0, 1.0, size=(Mo, 3)).astype(np.float32)
        obj_pos[o] = pts
        T = np.eye(4)
        T[:3, 3] = [(-2.0 + 4.0 * o), 0.0, 8.0 + 2.0 * o]
        T_true.append(T)
        pc = pts @ T[:3, :3].T + T[:3, 3]
        u = cam.fx * pc[:, 0] / pc[:, 2] + cam.cx
        v = cam.fy * pc[:, 1] / pc[:, 2] + cam.cy
        for j in range(Mo):
            if fi >= N or not (0 <= u[j] < cam.width and 0 <= v[j] < cam.height):
                continue
            feat_xy[fi] = (u[j], v[j])
            feat_desc[fi] = obj_desc[o, j]
            feat_depth[fi] = pc[j, 2]
            feat_uright[fi] = u[j] - cam.bf / pc[j, 2]
            feat_valid[fi] = True
            fi += 1
    T_init = np.stack([T.copy() for T in T_true]).astype(np.float32)
    T_init[:, :3, 3] += rng.normal(scale=0.15, size=(O, 3))

    phase = FusedObjectPhase(cfg)
    T_out, _, n_inl = phase(feat_xy, feat_level, feat_desc, feat_valid,
                            feat_depth, feat_uright,
                            obj_pos, obj_desc, obj_valid, T_init)
    for o in range(O):
        assert int(n_inl[o]) > 30
        err = np.linalg.norm(np.asarray(T_out[o])[:3, 3] - T_true[o][:3, 3])
        assert err < 0.03, f"object {o}: {err:.4f} m"


def test_fused_frame_step_matches_two_dispatch():
    """FusedFrameStep (one program) must equal .step then .phase (the
    streaming two-dispatch form) bit-for-bit on the same inputs."""
    import jax
    import jax.numpy as jnp

    from pointslot_tpu.config import CameraConfig, SystemConfig
    from pointslot_tpu.ops.fused_track import FusedFrameStep

    cam = CameraConfig(width=512, height=256, fx=300.0, fy=300.0,
                       cx=256.0, cy=128.0, bf=60.0)
    cfg = SystemConfig().replace(camera=cam)
    full = FusedFrameStep(cfg)

    rng = np.random.default_rng(3)
    left = rng.integers(0, 255, (cam.height, cam.width), dtype=np.uint8)
    right = np.roll(left, -4, axis=1)
    eye = jnp.eye(4, dtype=jnp.float32)
    M, O, Mo = 256, 2, 64
    pos = rng.uniform([-5, -2, 2], [5, 2, 20], (M, 3)).astype(np.float32)
    dsc = rng.integers(0, 2**32, (M, 8), dtype=np.uint32)
    lvl = np.zeros(M, np.int32)
    val = np.ones(M, bool)
    opos = rng.uniform([-1, -1, -1], [1, 1, 1], (O, Mo, 3)).astype(np.float32)
    odesc = rng.integers(0, 2**32, (O, Mo, 8), dtype=np.uint32)
    ovalid = np.ones((O, Mo), bool)
    oT = np.tile(np.eye(4, dtype=np.float32), (O, 1, 1))
    oT[:, 2, 3] = 8.0
    ovel = np.tile(np.eye(4, dtype=np.float32), (O, 1, 1))

    r2 = full.step(left, right, eye, eye, pos, dsc, lvl, val)
    T2, v2, n2 = full.phase(r2.xy, r2.level, r2.desc, r2.valid, r2.depth,
                            r2.u_right, opos, odesc, ovalid, oT, ovel)
    r1, T1, v1, n1 = full(left, right, eye, eye, pos, dsc, lvl, val,
                          opos, odesc, ovalid, oT, ovel)

    np.testing.assert_allclose(np.asarray(r1.T_cw), np.asarray(r2.T_cw),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(r1.desc), np.asarray(r2.desc))
    np.testing.assert_allclose(np.asarray(T1), np.asarray(T2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)
    assert np.array_equal(np.asarray(n1), np.asarray(n2))
