import numpy as np
import jax.numpy as jnp

from pointslot_tpu.ops.gms import gms_filter


def test_gms_keeps_consistent_motion(rng):
    """A dense consistent translation field survives; scattered random
    matches are rejected."""
    W, H = 640, 480
    n_good, n_bad = 300, 60
    a_good = rng.uniform([0, 0], [W - 40, H - 40], size=(n_good, 2))
    b_good = a_good + np.array([25.0, 10.0])
    a_bad = rng.uniform([0, 0], [W, H], size=(n_bad, 2))
    b_bad = rng.uniform([0, 0], [W, H], size=(n_bad, 2))
    xy_a = np.concatenate([a_good, a_bad]).astype(np.float32)
    xy_b = np.concatenate([b_good, b_bad]).astype(np.float32)
    valid = np.ones(n_good + n_bad, bool)
    keep = np.asarray(
        gms_filter(jnp.asarray(xy_a), jnp.asarray(xy_b), jnp.asarray(valid), W, H)
    )
    assert keep[:n_good].mean() > 0.8
    assert keep[n_good:].mean() < 0.3


def test_kitti_loader_roundtrip(tmp_path, rng):
    """Write a KITTI-format sequence from the synthetic scene, read it back."""
    from PIL import Image

    from pointslot_tpu.datasets.kitti import KittiTrackingSequence
    from pointslot_tpu.datasets.synthetic import (
        SyntheticRenderer, make_scene, offline_detection_rows,
    )

    scene = make_scene(n_frames=3, n_points=500, n_objects=1, seed=5)
    renderer = SyntheticRenderer(scene)
    rows = offline_detection_rows(scene)

    root = tmp_path / "kitti"
    (root / "image_02").mkdir(parents=True)
    (root / "image_03").mkdir()
    (root / "instances").mkdir()
    label_lines = []
    for i in range(3):
        left, right, inst = renderer.render(i)
        Image.fromarray(left).save(root / "image_02" / f"{i:06d}.png")
        Image.fromarray(right).save(root / "image_03" / f"{i:06d}.png")
        Image.fromarray(inst.astype(np.uint8)).save(root / "instances" / f"{i:06d}.png")
    for r in rows:
        if r[1] < 0:
            continue
        # KITTI label: frame track type trunc occ alpha x0 y0 x1 y1 h w l x y z ry
        # label Y is the 3D-box bottom-center (geometric center + h/2);
        # the reader shifts back to the geometric center
        label_lines.append(
            f"{int(r[0])} {int(r[1])} Car {r[2]:.2f} {int(r[3])} {r[4]:.6f} "
            f"{r[5]:.2f} {r[6]:.2f} {r[5] + r[7]:.2f} {r[6] + r[8]:.2f} "
            f"{r[10]:.2f} {r[11]:.2f} {r[9]:.2f} "
            f"{r[12]:.2f} {r[13] + r[10] / 2.0:.2f} {r[14]:.2f} {r[15]:.6f}"
        )
    (root / "ObjectTracking.txt").write_text("\n".join(label_lines) + "\n")

    seq = KittiTrackingSequence(str(root))
    assert len(seq) == 3
    left, right, dets, inst = seq.load(0)
    assert left.shape == (scene.camera.height, scene.camera.width)
    assert left.dtype == np.uint8
    assert len(dets) >= 1
    d = dets[0]
    orig = rows[(rows[:, 0] == 0) & (rows[:, 1] == d.track_id)][0]
    np.testing.assert_allclose(d.bbox, orig[5:9], atol=0.1)
    np.testing.assert_allclose(d.location_cam, orig[12:15], atol=0.01)
    np.testing.assert_allclose(d.dims, orig[9:12], atol=0.01)
    assert inst is not None
    # mask value matched to the detection
    assert (inst == d.mask_value).sum() > 50
