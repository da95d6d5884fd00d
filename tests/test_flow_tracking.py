"""Offline optical-flow object tracking (Virtual KITTI flow-map mode).

Covers the reference's SearchByOfflineOpticalFlowTracking path
(src/ORBmatcher.cc:2236-2369): 16-bit flow-PNG decode
(Frame::ReadVirtualKittiForwardOpticalFlow, src/Frame.cc:1458-1494), the
flow-guided point matcher, and the full mode-4 pipeline driven by GT flow
maps synthesized from the synthetic scene's geometry."""

import os

import numpy as np
import pytest

from pointslot_tpu.datasets.png16 import read_png16, write_png16


# ----------------------------------------------------------------------
def test_png16_roundtrip(tmp_path, rng):
    arr = rng.integers(0, 65536, size=(17, 23, 3)).astype(np.uint16)
    p = str(tmp_path / "x.png")
    write_png16(p, arr)
    back = read_png16(p)
    assert back.dtype == np.uint16
    assert np.array_equal(back, arr)
    gray = rng.integers(0, 65536, size=(9, 11)).astype(np.uint16)
    write_png16(p, gray)
    assert np.array_equal(read_png16(p), gray)


def test_png16_filters(tmp_path, rng):
    """Decoder handles Sub/Up/Average/Paeth-filtered rows (hand-encoded)."""
    import struct
    import zlib

    h, w = 6, 7
    arr = rng.integers(0, 65536, size=(h, w, 3)).astype(np.uint16)
    be = arr.astype(">u2")
    raw = bytearray()
    bpp = 6
    prev = np.zeros(w * bpp, np.uint8)
    filters = [0, 1, 2, 3, 4, 2]

    def paeth(a, b, c):
        p = int(a) + int(b) - int(c)
        pa, pb, pc = abs(p - int(a)), abs(p - int(b)), abs(p - int(c))
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    for r in range(h):
        cur = np.frombuffer(be[r].tobytes(), np.uint8).copy()
        ft = filters[r]
        enc = cur.copy()
        for i in range(len(cur)):
            left = cur[i - bpp] if i >= bpp else 0
            up = prev[i]
            ul = prev[i - bpp] if i >= bpp else 0
            if ft == 1:
                enc[i] = (int(cur[i]) - int(left)) & 0xFF
            elif ft == 2:
                enc[i] = (int(cur[i]) - int(up)) & 0xFF
            elif ft == 3:
                enc[i] = (int(cur[i]) - ((int(left) + int(up)) >> 1)) & 0xFF
            elif ft == 4:
                enc[i] = (int(cur[i]) - int(paeth(left, up, ul))) & 0xFF
        raw += bytes([ft]) + enc.tobytes()
        prev = cur

    def chunk(tag, data):
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(bytes(raw)))
           + chunk(b"IEND", b""))
    p = str(tmp_path / "f.png")
    with open(p, "wb") as f:
        f.write(png)
    assert np.array_equal(read_png16(p), arr)


def test_vkitti_flow_decode(tmp_path):
    """Encode a known flow field with the Virtual KITTI convention and
    check the reader recovers it (reference decode src/Frame.cc:1487-1488:
    u = (2/(2^16-1)*R - 1)*(W-1), v likewise from G; B==0 -> invalid)."""
    from pointslot_tpu.datasets.kitti import read_virtual_kitti_flow

    H, W = 12, 20
    rng = np.random.default_rng(3)
    flow = rng.uniform(-10, 10, size=(H, W, 2)).astype(np.float64)
    r = np.round((flow[:, :, 0] / (W - 1) + 1.0) * (2 ** 16 - 1) / 2.0)
    g = np.round((flow[:, :, 1] / (H - 1) + 1.0) * (2 ** 16 - 1) / 2.0)
    b = np.full((H, W), 65535, np.uint16)
    b[0, 0] = 0   # invalid pixel
    img = np.stack([r, g, b.astype(np.float64)], -1).astype(np.uint16)
    p = str(tmp_path / "flow_00000.png")
    write_png16(p, img)
    out = read_virtual_kitti_flow(p)
    assert out.shape == (H, W, 2)
    # quantization error bound: half a step of the 16-bit mapping
    tol_u = (W - 1) / (2 ** 16 - 1) + 1e-6
    tol_v = (H - 1) / (2 ** 16 - 1) + 1e-6
    mask = np.ones((H, W), bool)
    mask[0, 0] = False
    assert np.abs(out[:, :, 0] - flow[:, :, 0])[mask].max() <= tol_u * 1.01
    assert np.abs(out[:, :, 1] - flow[:, :, 1])[mask].max() <= tol_v * 1.01
    assert out[0, 0, 0] == 0.0 and out[0, 0, 1] == 0.0


# ----------------------------------------------------------------------
def test_guided_match_kernel(rng):
    """Flow-warped predictions pick the right features inside the radius
    and refuse matches outside it / above the Hamming gate."""
    import jax.numpy as jnp

    from pointslot_tpu.slam.matchers import guided_match

    M, N = 16, 32
    desc = rng.integers(0, 2 ** 32, size=(N, 8), dtype=np.uint64).astype(np.uint32)
    feat_xy = rng.uniform(20, 300, size=(N, 2)).astype(np.float32)
    # points 0..M-1 correspond to features 0..M-1
    pred_xy = feat_xy[:M] + rng.uniform(-3, 3, size=(M, 2)).astype(np.float32)
    pt_desc = desc[:M].copy()
    pred_ok = np.ones(M, bool)
    pred_ok[3] = False                      # no anchor -> no match
    pred_xy[5] = feat_xy[5] + 40.0          # outside the radius -> no match
    res = guided_match(
        jnp.asarray(pred_xy), jnp.asarray(pred_ok), jnp.asarray(pt_desc),
        jnp.asarray(feat_xy), jnp.asarray(desc), jnp.ones(N, bool),
        radius=5.0, th_desc=130,
    )
    pf = np.asarray(res.point_for_feature)
    for i in range(M):
        if i in (3, 5):
            # unanchored / mispredicted points must not claim their true
            # feature (a loose-gate false positive elsewhere is allowed —
            # the reference kills those with PnP-RANSAC downstream)
            assert pf[i] != i
        else:
            assert pf[i] == i, f"feature {i} matched {pf[i]}"
    assert int(res.n_matches) >= M - 2


# ----------------------------------------------------------------------
def _gt_forward_flow(scene, renderer, i):
    """Dense GT forward flow frame i -> i+1 from rendered depth + poses."""
    left, right, inst, depth = renderer.render_with_depth(i)
    H, W = depth.shape
    cam = scene.camera
    us, vs = np.meshgrid(np.arange(W, dtype=np.float64),
                         np.arange(H, dtype=np.float64))
    z = depth.astype(np.float64)
    valid = z < 1e8
    x = (us - cam.cx) * z / cam.fx
    y = (vs - cam.cy) * z / cam.fy
    pc = np.stack([x, y, z], -1)
    T_wc = scene.poses_world[i]
    T_cw_next = np.linalg.inv(scene.poses_world[i + 1])
    pw = pc @ T_wc[:3, :3].T + T_wc[:3, 3]
    pw_next = pw.copy()
    for obj in scene.objects:
        m = inst == (obj.track_id + 1)
        if not m.any():
            continue
        T_rel = obj.poses_world[i + 1] @ np.linalg.inv(obj.poses_world[i])
        pw_next[m] = pw[m] @ T_rel[:3, :3].T + T_rel[:3, 3]
    pc2 = pw_next @ T_cw_next[:3, :3].T + T_cw_next[:3, 3]
    z2 = np.maximum(pc2[..., 2], 1e-6)
    u2 = cam.fx * pc2[..., 0] / z2 + cam.cx
    v2 = cam.fy * pc2[..., 1] / z2 + cam.cy
    flow = np.stack([u2 - us, v2 - vs], -1).astype(np.float32)
    flow[~valid] = 0.0
    return flow


@pytest.fixture(scope="module")
def flow_slot_run():
    from pointslot_tpu.config import SLOTMode, SystemConfig
    from pointslot_tpu.datasets.synthetic import (
        SyntheticRenderer, make_scene, offline_detection_rows,
    )
    from pointslot_tpu.slam.objects import Detection
    from pointslot_tpu.slam.system import System

    n_frames = 10
    scene = make_scene(n_frames=n_frames, n_points=2500, n_objects=2, seed=31,
                       forward_speed=0.8)
    renderer = SyntheticRenderer(scene)
    rows = offline_detection_rows(scene)
    cfg = SystemConfig(slot_mode=SLOTMode.OFFLINE)
    cfg = cfg.replace(
        objects=cfg.objects.__class__(
            **{**cfg.objects.__dict__, "init_min_features": 10,
               "init_min_map_points": 8, "min_tracked_points": 8,
               "track_min_features": 10, "set_init_position_by_points": False,
               "use_offline_flow": True}),
        tracking=cfg.tracking.__class__(
            **{**cfg.tracking.__dict__, "min_init_stereo_features": 350}),
    )
    system = System(cfg)
    for i in range(n_frames):
        left, right, inst = renderer.render(i)
        frame_rows = rows[(rows[:, 0] == i) & (rows[:, 1] >= 0)]
        dets = [Detection.from_row24(r, mask_value=int(r[1]) + 1)
                for r in frame_rows]
        flow = (_gt_forward_flow(scene, renderer, i)
                if i + 1 < n_frames else None)
        system.track_stereo(left, right, timestamp=i * 0.1, frame_id=i,
                            detections=dets, instance_mask=inst, flow=flow)
    return scene, system


def test_flow_path_engaged(flow_slot_run):
    scene, system = flow_slot_run
    objsys = system._object_system
    assert objsys is not None and len(objsys.all_tracks) >= 1
    best = max(objsys.all_tracks, key=lambda t: t.flow_tracked_frames)
    assert best.flow_tracked_frames >= 3, (
        f"flow-guided matching never took over "
        f"(flow_tracked_frames={best.flow_tracked_frames})"
    )


def test_flow_object_pose_accuracy(flow_slot_run):
    scene, system = flow_slot_run
    objsys = system._object_system
    gt = {o.track_id: o for o in scene.objects}
    errs = []
    for track in objsys.all_tracks:
        obj = gt.get(track.track_id)
        if obj is None:
            continue
        for f, T_wo in track.poses_world.items():
            errs.append(np.linalg.norm(
                T_wo[:3, 3] - obj.poses_world[f][:3, 3]))
    assert errs, "no object poses recorded"
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    assert rmse < 0.5, f"object position RMSE {rmse:.3f} m with flow tracking"
