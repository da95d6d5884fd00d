"""Built-in ATE/RPE + object-pose evaluation (pointslot_tpu/evaluate.py).

The reference leaves metrics to evo / the KITTI devkit (SURVEY.md §4);
these tests pin our built-in implementations to analytic cases."""

import json

import numpy as np
import pytest

from pointslot_tpu import evaluate as ev


def _traj_circle(n=40, radius=5.0):
    """T_wc poses on a circle with tangent heading."""
    out = []
    for i in range(n):
        a = 2 * np.pi * i / n
        T = np.eye(4)
        c, s = np.cos(a), np.sin(a)
        T[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        T[:3, 3] = [radius * np.cos(a), 0.0, radius * np.sin(a)]
        out.append(T)
    return np.stack(out)


def _rigid(T_wc, R, t, s=1.0):
    """Apply a world-frame similarity to every pose."""
    A = np.eye(4)
    A[:3, :3] = s * R
    A[:3, 3] = t
    out = A @ T_wc
    # renormalize rotation block (keep it a valid pose for RPE)
    out[:, :3, :3] /= s
    out[:, :3, 3] = (s * (R @ T_wc[:, :3, 3].T)).T + t
    return out


def test_umeyama_recovers_similarity():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(50, 3))
    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    t = np.array([1.0, -2.0, 0.5])
    dst = (1.8 * (R @ src.T)).T + t
    s_, R_, t_ = ev.umeyama_alignment(src, dst, with_scale=True)
    assert abs(s_ - 1.8) < 1e-9
    assert np.allclose(R_, R, atol=1e-9)
    assert np.allclose(t_, t, atol=1e-9)


def test_ate_zero_after_alignment_and_offset_without():
    gt = _traj_circle()
    th = 0.3
    R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                  [-np.sin(th), 0, np.cos(th)]])
    est = _rigid(gt, R, np.array([3.0, 0.0, -1.0]))
    aligned = ev.ate(est, gt, align=True)
    raw = ev.ate(est, gt, align=False)
    assert aligned["rmse"] < 1e-9
    assert raw["rmse"] > 1.0
    assert aligned["n"] == len(gt)


def test_ate_reflects_noise_scale():
    rng = np.random.default_rng(1)
    gt = _traj_circle()
    est = gt.copy()
    sigma = 0.05
    est[:, :3, 3] += rng.normal(scale=sigma, size=(len(gt), 3))
    r = ev.ate(est, gt, align=True)["rmse"]
    assert 0.4 * sigma * np.sqrt(3) < r < 1.6 * sigma * np.sqrt(3)


def test_rpe_translation_and_rotation():
    gt = _traj_circle()
    est = gt.copy()
    # corrupt ONE step by a known relative translation: exactly one RPE
    # sample at delta=1 carries it
    est[10:, :3, 3] += gt[10, :3, :3] @ np.array([0.2, 0.0, 0.0])
    r = ev.rpe(est, gt, delta=1)
    assert r["n"] == len(gt) - 1
    expected = np.sqrt(0.2 ** 2 / r["n"])
    assert abs(r["trans_rmse"] - expected) < 1e-6
    assert r["rot_rmse_deg"] < 1e-6

    # rotation corruption of ONE pose: two relative motions (into and out
    # of pose 20) each carry a 5-degree rotation error (conjugation
    # preserves the angle)
    est = gt.copy()
    dth = np.radians(5.0)
    Rz = np.eye(4)
    Rz[:3, :3] = np.array([[np.cos(dth), -np.sin(dth), 0],
                           [np.sin(dth), np.cos(dth), 0], [0, 0, 1.0]])
    est[20] = gt[20] @ Rz
    r = ev.rpe(est, gt, delta=1)
    expected_rot = np.degrees(dth) * np.sqrt(2.0 / r["n"])
    assert abs(r["rot_rmse_deg"] - expected_rot) < 0.05


def test_rpe_rejects_short_input():
    gt = _traj_circle(n=3)
    with pytest.raises(ValueError):
        ev.rpe(gt, gt, delta=5)


def _gt_rows(n_frames=6, tracks=(1, 3)):
    rows = []
    for f in range(n_frames):
        for tid in tracks:
            row = np.zeros(24)
            row[0], row[1] = f, tid
            row[9:12] = [3.8, 1.6, 1.7]
            row[12:15] = [1.0 * tid, 0.5, 8.0 + f]
            row[15] = 0.1 * tid
            row[16], row[17], row[18] = 1.0, 1.0, 1.0
            rows.append(row)
    return np.asarray(rows)


def _pose_from_row(row, dc=np.zeros(3), dry=0.0):
    from pointslot_tpu.slam.object_system import _rotation_y_matrix

    T = np.eye(4)
    T[:3, :3] = _rotation_y_matrix(row[15] + dry)
    T[:3, 3] = row[12:15] + dc
    return T


def test_object_pose_errors_exact_and_noisy():
    gt = _gt_rows()
    est = {(int(r[0]), int(r[1])): _pose_from_row(r) for r in gt}
    out = ev.object_pose_errors(est, gt)
    assert out["coverage"] == 1.0
    assert out["center_rmse"] < 1e-12
    assert out["heading_rmse_deg"] < 1e-9

    # known center offset + heading offset on track 3 only
    est = {
        (int(r[0]), int(r[1])): _pose_from_row(
            r,
            dc=np.array([0.3, 0, 0]) if r[1] == 3 else np.zeros(3),
            dry=np.radians(4.0) if r[1] == 3 else 0.0,
        )
        for r in gt
    }
    out = ev.object_pose_errors(est, gt)
    assert abs(out["per_track"][3]["center_rmse"] - 0.3) < 1e-9
    assert abs(out["per_track"][3]["heading_rmse_deg"] - 4.0) < 1e-6
    assert out["per_track"][1]["center_rmse"] < 1e-12


def test_object_pose_errors_coverage_and_filters():
    gt = _gt_rows()
    # estimates only for track 1, frames 0-2
    est = {(f, 1): _pose_from_row(gt[2 * f]) for f in range(3)}
    out = ev.object_pose_errors(est, gt)
    assert out["n_matched"] == 3
    assert out["n_gt"] == len(gt)
    # heading wraparound: pi-adjacent angles measure small
    row = gt[0].copy()
    row[15] = np.pi - 0.01
    est = {(0, 1): _pose_from_row(row, dry=0.02)}
    out = ev.object_pose_errors(est, row[None])
    assert out["heading_rmse_deg"] < 1.5


def test_mot_metrics_perfect_and_switch():
    gt = _gt_rows(n_frames=6, tracks=(1, 3))
    # bboxes distinct per track
    for r in gt:
        r[5:9] = [100 * r[1], 50, 40, 30]
    est = {
        int(f): {int(tid): np.array([100 * tid, 50, 40, 30])
                 for tid in (1, 3)}
        for f in range(6)
    }
    out = ev.mot_metrics(est, gt)
    assert out["mota"] == 1.0 and out["id_switches"] == 0
    assert out["motp_iou"] > 0.99 and out["misses"] == 0

    # GT track 1 covered by est id 7 for frames 0-2 then est id 8: 1 switch
    est = {}
    for f in range(6):
        eid = 7 if f < 3 else 8
        est[f] = {eid: np.array([100.0, 50, 40, 30]),
                  30: np.array([300.0, 50, 40, 30])}
    out = ev.mot_metrics(est, gt)
    assert out["id_switches"] == 1
    assert out["matches"] == 12 and out["misses"] == 0
    assert out["false_positives"] == 0
    assert abs(out["mota"] - (1.0 - 1 / 12)) < 1e-9


def test_mot_metrics_misses_and_false_positives():
    gt = _gt_rows(n_frames=4, tracks=(1,))
    for r in gt:
        r[5:9] = [100, 50, 40, 30]
    # est misses frames 2-3, and adds a spurious box each frame
    est = {f: {1: np.array([100.0, 50, 40, 30])} for f in range(2)}
    for f in range(4):
        est.setdefault(f, {})[99] = np.array([900.0, 50, 40, 30])
    out = ev.mot_metrics(est, gt)
    assert out["misses"] == 2 and out["false_positives"] == 4
    assert out["matches"] == 2
    assert abs(out["mota"] - (1.0 - 6 / 4)) < 1e-9  # MOTA can go negative


def test_cli_roundtrip(tmp_path):
    from pointslot_tpu.io.writers import write_trajectory_kitti

    gt = _traj_circle(n=12)
    est = gt.copy()
    est[:, :3, 3] += 0.01
    write_trajectory_kitti(str(tmp_path / "gt.txt"),
                           [(i, np.linalg.inv(T), False) for i, T in enumerate(gt)])
    write_trajectory_kitti(str(tmp_path / "est.txt"),
                           [(i, np.linalg.inv(T), False) for i, T in enumerate(est)])
    out = ev.main(["traj", "--est", str(tmp_path / "est.txt"),
                   "--gt", str(tmp_path / "gt.txt")])
    assert out["ate"]["rmse"] < 1e-6     # constant offset aligns away
    assert out["rpe"]["trans_rmse"] < 1e-6

    # objects subcommand over the camera-frame saver format
    gt_rows = _gt_rows(n_frames=3)
    lines = []
    for r in gt_rows:
        T = _pose_from_row(r)
        vals = " ".join(f"{v:.9f}" for v in T[:3, :4].reshape(-1))
        lines.append(f"{int(r[0])} {int(r[1])} {vals}")
    (tmp_path / "obj.txt").write_text("\n".join(lines) + "\n")
    gt_lines = []
    for r in gt_rows:
        gt_lines.append(
            # label Y is the box bottom-center (geometric center + h/2);
            # the reader shifts back
            f"{int(r[0])} {int(r[1])} Car {r[2]:g} {r[3]:g} {r[4]:g} "
            f"{r[5]:g} {r[6]:g} {r[5] + r[7]:g} {r[6] + r[8]:g} "
            f"{r[10]:g} {r[11]:g} {r[9]:g} "
            f"{r[12]:g} {r[13] + r[10] / 2:g} {r[14]:g} {r[15]:g}"
        )
    (tmp_path / "gt_obj.txt").write_text("\n".join(gt_lines) + "\n")
    out = ev.main(["objects", "--est", str(tmp_path / "obj.txt"),
                   "--gt", str(tmp_path / "gt_obj.txt")])
    assert out["coverage"] == 1.0 and out["center_rmse"] < 1e-6
    json.dumps(out)   # JSON-serializable
