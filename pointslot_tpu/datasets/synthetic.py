"""Synthetic stereo SLOT scene generator.

Produces deterministic stereo image sequences with known camera trajectory,
3D structure, and moving rigid objects (textured boxes) — the test/bench
substitute for KITTI tracking sequences (which are not vendored). Everything
is plain numpy on the host; images come out in the KITTI tracking geometry
(1242x375 by default) so kernels and the full pipeline exercise realistic
shapes.

Also emits offline detections in the reference's 1x24-row schema
(reference src/Tracking.cc:481-640) + instance segmentation masks
(mask semantics 0 = background, k = object k-1, 255 = ignore;
reference src/Frame.cc:810-844), so SLOT mode 4 runs end-to-end.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from pointslot_tpu.config import CameraConfig


def _smooth_noise_texture(rng: np.random.Generator, h: int, w: int, octaves: int = 4) -> np.ndarray:
    """Multi-octave value-noise texture in [0, 1] — gives FAST corners at all scales."""
    out = np.zeros((h, w), np.float32)
    amp = 1.0
    for o in range(octaves):
        step = 2 ** (octaves - o + 2)
        gh, gw = h // step + 2, w // step + 2
        g = rng.uniform(0, 1, size=(gh, gw)).astype(np.float32)
        ys = np.linspace(0, gh - 1.001, h)
        xs = np.linspace(0, gw - 1.001, w)
        y0 = ys.astype(int); x0 = xs.astype(int)
        fy = (ys - y0)[:, None]; fx = (xs - x0)[None, :]
        v = (
            g[y0][:, x0] * (1 - fy) * (1 - fx)
            + g[y0][:, x0 + 1] * (1 - fy) * fx
            + g[y0 + 1][:, x0] * fy * (1 - fx)
            + g[y0 + 1][:, x0 + 1] * fy * fx
        )
        out += amp * v
        amp *= 0.55
    out -= out.min()
    out /= max(out.max(), 1e-6)
    return out


@dataclass
class SyntheticObject:
    """A moving textured box: pose trajectory + dimensions."""

    track_id: int
    dims: np.ndarray                     # (3,) w, h, l (x, y, z extents in object frame)
    poses_world: List[np.ndarray] = field(default_factory=list)  # per-frame 4x4 T_wo
    is_moving: bool = True


@dataclass
class SyntheticScene:
    camera: CameraConfig
    n_frames: int
    poses_world: List[np.ndarray]        # per-frame camera T_wc (camera-to-world)
    points_world: np.ndarray             # (N, 3) static structure
    objects: List[SyntheticObject]
    seed: int = 0

    @property
    def T_cw(self) -> List[np.ndarray]:
        return [np.linalg.inv(T) for T in self.poses_world]


def make_scene(
    n_frames: int = 30,
    camera: Optional[CameraConfig] = None,
    n_points: int = 3000,
    n_objects: int = 2,
    seed: int = 0,
    forward_speed: float = 1.0,
    yaw_rate: float = 0.004,
) -> SyntheticScene:
    """Camera drives forward (+z) with slight yaw; static points populate a
    corridor; objects are boxes moving ahead of the camera (KITTI-like)."""
    cam = camera or CameraConfig()
    rng = np.random.default_rng(seed)

    # static structure: walls + ground + scattered
    n_wall = n_points // 3
    n_ground = n_points // 3
    n_scatter = n_points - n_wall - n_ground
    zs = rng.uniform(2.0, 20.0 + forward_speed * n_frames, size=n_wall)
    walls = np.stack(
        [
            np.where(rng.uniform(size=n_wall) < 0.5, -8.0, 8.0)
            + rng.normal(scale=0.5, size=n_wall),
            rng.uniform(-3.0, 1.2, size=n_wall),
            zs,
        ],
        axis=1,
    )
    ground = np.stack(
        [
            rng.uniform(-8, 8, size=n_ground),
            np.full(n_ground, 1.6) + rng.normal(scale=0.05, size=n_ground),
            rng.uniform(2.0, 20.0 + forward_speed * n_frames, size=n_ground),
        ],
        axis=1,
    )
    scatter = np.stack(
        [
            rng.uniform(-10, 10, size=n_scatter),
            rng.uniform(-4, 1.6, size=n_scatter),
            rng.uniform(2.0, 25.0 + forward_speed * n_frames, size=n_scatter),
        ],
        axis=1,
    )
    points = np.concatenate([walls, ground, scatter], axis=0).astype(np.float64)

    # camera trajectory: forward with gentle yaw
    poses = []
    T = np.eye(4)
    for i in range(n_frames):
        poses.append(T.copy())
        c, s = np.cos(yaw_rate), np.sin(yaw_rate)
        Ry = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        step = np.eye(4)
        step[:3, :3] = Ry
        step[:3, 3] = Ry @ np.array([0, 0, forward_speed])
        T = T @ step

    # moving objects: boxes ahead, moving forward at different speeds
    objects = []
    for k in range(n_objects):
        dims = np.array([1.6, 1.5, 3.5])  # w h l: car-ish
        lateral = -3.0 + 6.0 * (k % 2) + rng.normal(scale=0.3)
        z0 = 8.0 + 4.0 * k
        speed = forward_speed * (0.5 + 0.4 * k)
        obj_poses = []
        for i in range(n_frames):
            Two = np.eye(4)
            Two[:3, 3] = np.array([lateral, 0.85, z0 + speed * i])
            obj_poses.append(Two)
        objects.append(
            SyntheticObject(track_id=k, dims=dims, poses_world=obj_poses,
                            is_moving=speed > 1e-3)
        )

    return SyntheticScene(
        camera=cam, n_frames=n_frames, poses_world=poses,
        points_world=points, objects=objects, seed=seed,
    )


def _box_faces(dims: np.ndarray):
    """Return the 6 faces of an axis-aligned box centered at the origin as
    (origin, u_axis, v_axis, normal) tuples. dims = full extents (x, y, z)."""
    hx, hy, hz = dims / 2.0
    faces = []
    for axis, h in ((0, hx), (1, hy), (2, hz)):
        for sign in (-1.0, 1.0):
            n = np.zeros(3); n[axis] = sign
            u = np.zeros(3); u[(axis + 1) % 3] = 1.0
            v = np.zeros(3); v[(axis + 2) % 3] = 1.0
            origin = n * h
            extent_u = [hx, hy, hz][(axis + 1) % 3]
            extent_v = [hx, hy, hz][(axis + 2) % 3]
            faces.append((origin, u * extent_u, v * extent_v, n))
    return faces


class SyntheticRenderer:
    """Rasterizes the scene into stereo grayscale uint8 frames.

    Splats textured quads for object boxes and a noise background whose
    texture is attached to world rays (so it moves correctly with parallax
    at infinity approximation) plus bright dots at structure points that
    produce trackable corners.
    """

    def __init__(self, scene: SyntheticScene):
        self.scene = scene
        cam = scene.camera
        rng = np.random.default_rng(scene.seed + 1)
        self._bg = _smooth_noise_texture(rng, cam.height * 2, cam.width * 3)
        self._point_intensity = rng.uniform(0.25, 1.0, size=len(scene.points_world))
        self._obj_tex = [
            _smooth_noise_texture(np.random.default_rng(scene.seed + 10 + o.track_id), 128, 128)
            for o in scene.objects
        ]

    def _project(self, pts_cam: np.ndarray, baseline_shift: float):
        cam = self.scene.camera
        z = pts_cam[:, 2]
        valid = z > 0.25
        u = cam.fx * (pts_cam[:, 0] - baseline_shift) / np.maximum(z, 1e-6) + cam.cx
        v = cam.fy * pts_cam[:, 1] / np.maximum(z, 1e-6) + cam.cy
        return u, v, z, valid

    def _render_one(self, frame_idx: int, baseline_shift: float):
        cam = self.scene.camera
        H, W = cam.height, cam.width
        T_cw = np.linalg.inv(self.scene.poses_world[frame_idx])

        # background: sample the big texture with a yaw-dependent shift
        R_wc = self.scene.poses_world[frame_idx][:3, :3]
        yaw = np.arctan2(R_wc[0, 2], R_wc[2, 2])
        shift_x = int((yaw / (2 * np.pi)) * self._bg.shape[1] * 4) % self._bg.shape[1]
        # stereo shift: background is far, use small disparity offset
        bg_disp = int(round(cam.bf / 60.0)) if baseline_shift > 0 else 0
        xs = (np.arange(W) + shift_x + bg_disp) % self._bg.shape[1]
        img = self._bg[:H, :][:, xs].copy() * 0.45

        depth = np.full((H, W), 1e9, np.float32)

        # splat structure points as 3x3 bright/dark dots (corner features)
        pts_cam = (T_cw[:3, :3] @ self.scene.points_world.T).T + T_cw[:3, 3]
        u, v, z, valid = self._project(pts_cam, baseline_shift)
        ui = np.round(u).astype(int)
        vi = np.round(v).astype(int)
        ok = valid & (ui >= 2) & (ui < W - 2) & (vi >= 2) & (vi < H - 2)
        order = np.argsort(-z[ok])  # far first so near overwrites
        for idx in np.nonzero(ok)[0][order]:
            x, y = ui[idx], vi[idx]
            val = self._point_intensity[idx]
            img[y - 1 : y + 2, x - 1 : x + 2] = val
            img[y, x] = min(1.0, val + 0.25)
            depth[y - 1 : y + 2, x - 1 : x + 2] = z[idx]

        # rasterize object box faces with texture
        inst = np.zeros((H, W), np.uint8)
        for oi, obj in enumerate(self.scene.objects):
            T_co = T_cw @ obj.poses_world[frame_idx]
            tex = self._obj_tex[oi]
            for origin, uax, vax, normal in _box_faces(obj.dims):
                n_cam = T_co[:3, :3] @ normal
                center = T_co[:3, :3] @ origin + T_co[:3, 3]
                if np.dot(n_cam, center) >= 0:
                    continue  # back face
                # sample the face on a grid, splat
                n_samp = 96
                gu = np.linspace(-1, 1, n_samp)
                gv = np.linspace(-1, 1, n_samp)
                GU, GV = np.meshgrid(gu, gv)
                pts_obj = (
                    origin[None, :]
                    + GU.reshape(-1, 1) * uax[None, :]
                    + GV.reshape(-1, 1) * vax[None, :]
                )
                pc = (T_co[:3, :3] @ pts_obj.T).T + T_co[:3, 3]
                uu, vv, zz, val = self._project(pc, baseline_shift)
                uui = np.round(uu).astype(int)
                vvi = np.round(vv).astype(int)
                okm = val & (uui >= 0) & (uui < W) & (vvi >= 0) & (vvi < H)
                ti = ((GU.reshape(-1) + 1) * 63.5).astype(int)
                tj = ((GV.reshape(-1) + 1) * 63.5).astype(int)
                tvals = tex[tj * 2 % 128, ti * 2 % 128]
                for idx in np.nonzero(okm)[0]:
                    y, x = vvi[idx], uui[idx]
                    if zz[idx] < depth[y, x]:
                        depth[y, x] = zz[idx]
                        img[y, x] = 0.2 + 0.75 * tvals[idx]
                        inst[y, x] = oi + 1
        return (np.clip(img, 0, 1) * 255).astype(np.uint8), inst, depth

    def render(self, frame_idx: int):
        """Returns (left, right, instance_mask_left) uint8 arrays."""
        cam = self.scene.camera
        left, inst, _ = self._render_one(frame_idx, 0.0)
        right, _, _ = self._render_one(frame_idx, cam.baseline)
        return left, right, inst


def offline_detection_rows(scene: SyntheticScene) -> np.ndarray:
    """Per-frame object detections in the reference's 1x24-row layout
    (reference src/Tracking.cc:574-610):

    [0] frame_id [1] track_id [2] truncated [3] occluded [4] alpha
    [5:9] bbox (x, y, w, h) [9:12] dims (l? h? — ref stores dimensions[0:3]
    as read h,w,l reordered; we store (d0, d1, d2) = (length, height, width)
    to match its index use) [12:15] location in CAMERA frame [15] rotation_y
    [16] score [17] type_id [18] is_moving [19] extend [20:24] zeros.

    Returns array (n_rows, 24); frames with no objects get a single row with
    track_id = -1 like the reference's padding.
    """
    cam = scene.camera
    rows = []
    for f in range(scene.n_frames):
        T_cw = np.linalg.inv(scene.poses_world[f])
        any_obj = False
        for obj in scene.objects:
            T_co = T_cw @ obj.poses_world[f]
            center = T_co[:3, 3]
            if center[2] < 1.0:
                continue
            # project box corners for the 2D bbox
            hx, hy, hz = obj.dims / 2
            corners = np.array(
                [
                    [sx * hx, sy * hy, sz * hz]
                    for sx in (-1, 1)
                    for sy in (-1, 1)
                    for sz in (-1, 1)
                ]
            )
            pc = (T_co[:3, :3] @ corners.T).T + T_co[:3, 3]
            if np.any(pc[:, 2] < 0.2):
                continue
            u = cam.fx * pc[:, 0] / pc[:, 2] + cam.cx
            v = cam.fy * pc[:, 1] / pc[:, 2] + cam.cy
            x0, x1 = u.min(), u.max()
            y0, y1 = v.min(), v.max()
            if x1 < 0 or y1 < 0 or x0 >= cam.width or y0 >= cam.height:
                continue
            x0c, y0c = max(x0, 0), max(y0, 0)
            x1c, y1c = min(x1, cam.width - 1), min(y1, cam.height - 1)
            if (x1c - x0c) < 12 or (y1c - y0c) < 12:
                continue
            R_co = T_co[:3, :3]
            rot_y = np.arctan2(R_co[0, 2], R_co[2, 2])
            row = np.zeros(24)
            row[0] = f
            row[1] = obj.track_id
            row[2] = 0.0  # truncated
            row[3] = 0.0  # occluded
            row[4] = 0.0  # alpha
            row[5:9] = [x0c, y0c, x1c - x0c, y1c - y0c]
            # dims ordering matches reference row: [9]=d_len, [10]=d_h, [11]=d_w
            row[9] = obj.dims[2]
            row[10] = obj.dims[1]
            row[11] = obj.dims[0]
            row[12:15] = center
            row[15] = rot_y
            row[16] = 1.0  # score
            row[17] = 1.0  # type_id: vehicle
            row[18] = float(obj.is_moving)
            rows.append(row)
            any_obj = True
        if not any_obj:
            row = np.zeros(24)
            row[0] = f
            row[1] = -1
            rows.append(row)
    return np.array(rows)
