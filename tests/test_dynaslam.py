"""DynaSLAM sub-mode: dynamic masks carried by the 2D tracker when only the
first frame is annotated (reference src/Tracking.cc:127-139)."""

import numpy as np

from pointslot_tpu.config import SLOTMode, SystemConfig
from pointslot_tpu.datasets.synthetic import SyntheticRenderer, make_scene
from pointslot_tpu.slam.system import System
from pointslot_tpu.slam.tracking import TrackingState


def test_dynaslam_carries_mask():
    scene = make_scene(n_frames=8, n_objects=1, seed=97, forward_speed=0.6)
    renderer = SyntheticRenderer(scene)
    cfg = SystemConfig(slot_mode=SLOTMode.DYNAMIC_SLAM, dynaslam_mode=1)
    cfg = cfg.replace(tracking=cfg.tracking.__class__(
        **{**cfg.tracking.__dict__, "min_init_stereo_features": 350}))
    system = System(cfg)
    frame = None
    for i in range(8):
        left, right, inst = renderer.render(i)
        # mask only on frame 0; tracker must carry it forward
        mask = inst if i == 0 else None
        frame = system.track_stereo(left, right, i * 0.1, i, instance_mask=mask)
    assert system.tracker.state == TrackingState.OK
    # last frame's features should still avoid the (moving) object region
    left, right, inst = renderer.render(7)
    v = frame.valid
    xy = frame.xy[v]
    yi = np.clip(np.round(xy[:, 1]).astype(int), 0, inst.shape[0] - 1)
    xi = np.clip(np.round(xy[:, 0]).astype(int), 0, inst.shape[1] - 1)
    inside = (inst[yi, xi] != 0).mean()
    assert inside < 0.08, f"{inside:.3f} of features inside the dynamic region"
