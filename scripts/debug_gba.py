"""Debug the GBA-on loop-closure regression: measure ATE at each stage."""
import numpy as np

from pointslot_tpu.config import SystemConfig
from pointslot_tpu.datasets.synthetic import SyntheticRenderer, make_loop_scene
from pointslot_tpu.slam.system import System
from pointslot_tpu.slam import loop_closing


def ate_of(system, scene):
    traj = system.camera_trajectory()
    f0 = traj[0][0]
    A = scene.poses_world[f0]
    errs = [
        np.linalg.norm((A @ np.linalg.inv(T))[:3, 3] - scene.poses_world[f][:3, 3])
        for f, T, _ in traj
    ]
    return float(np.sqrt(np.mean(np.square(errs)))), float(errs[-1])


def map_ate(system, scene, label):
    # ATE over keyframe poses currently in the map
    m = system.map
    kfs = m.keyframe_ids()
    f0 = int(m.kf_frame_id[kfs[0]])
    A = scene.poses_world[f0]
    errs = []
    for k in kfs:
        f = int(m.kf_frame_id[k])
        T = m.kf_pose[int(k)].astype(np.float64)
        errs.append(np.linalg.norm((A @ np.linalg.inv(T))[:3, 3]
                                   - scene.poses_world[f][:3, 3]))
    print(f"{label}: map-KF ATE rmse={np.sqrt(np.mean(np.square(errs))):.3f} "
          f"max={np.max(errs):.3f}")


def run(gba: bool):
    scene = make_loop_scene(n_frames=48, seed=41, radius=7.0)
    renderer = SyntheticRenderer(scene)
    cfg = SystemConfig()
    object.__setattr__(cfg.loop, "run_global_ba", gba)
    object.__setattr__(cfg.loop, "background_gba", False)  # inline for staging prints
    system = System(cfg)

    # instrument the loop closer
    lc = system.loop_closer
    orig_correct = lc._correct_loop
    orig_gba = lc._launch_global_ba
    orig_fuse = lc._search_and_fuse

    def corr(kf, cand, T_lc):
        map_ate(system, scene, "before correction")
        orig_correct(kf, cand, T_lc)
        map_ate(system, scene, "after full correction")

    def fuse(kf, cand):
        map_ate(system, scene, "after pose graph (pre-fuse)")
        orig_fuse(kf, cand)

    def g(fixed_kf):
        map_ate(system, scene, "pre-GBA")
        orig_gba(fixed_kf)
        map_ate(system, scene, "post-GBA")

    lc._correct_loop = corr
    lc._launch_global_ba = g
    lc._search_and_fuse = fuse

    for i in range(scene.n_frames):
        left, right, _ = renderer.render(i)
        system.track_stereo(left, right, timestamp=i * 0.1, frame_id=i)
    ate, end = ate_of(system, scene)
    print(f"gba={gba}: loops={lc.loops_closed} traj ATE={ate:.3f} end={end:.3f}")


if __name__ == "__main__":
    run(False)
    print("=" * 60)
    run(True)
