import numpy as np
import jax.numpy as jnp

from pointslot_tpu.config import CameraConfig
from pointslot_tpu.datasets.synthetic import SyntheticRenderer, make_scene
from pointslot_tpu.ops import hamming
from pointslot_tpu.ops.frontend import StereoFrontend


def test_hamming_popcount_vs_bruteforce(rng):
    a = rng.integers(0, 2 ** 32, size=(20, 8), dtype=np.uint32)
    b = rng.integers(0, 2 ** 32, size=(30, 8), dtype=np.uint32)
    got = np.asarray(hamming.hamming_table_popcount(jnp.asarray(a), jnp.asarray(b)))
    bits_a = np.unpackbits(a.view(np.uint8), axis=1)
    bits_b = np.unpackbits(b.view(np.uint8), axis=1)
    want = (bits_a[:, None, :] != bits_b[None, :, :]).sum(-1)
    np.testing.assert_array_equal(got, want)


def test_hamming_mxu_matches_popcount(rng):
    a = rng.integers(0, 2 ** 32, size=(64, 8), dtype=np.uint32)
    b = rng.integers(0, 2 ** 32, size=(48, 8), dtype=np.uint32)
    pop = np.asarray(hamming.hamming_table_popcount(jnp.asarray(a), jnp.asarray(b)))
    sa = hamming.unpack_signs(jnp.asarray(a))
    sb = hamming.unpack_signs(jnp.asarray(b))
    mxu = np.asarray(hamming.hamming_table_mxu(sa, sb))
    np.testing.assert_array_equal(pop, mxu)


def test_hamming_identity_is_zero(rng):
    a = rng.integers(0, 2 ** 32, size=(16, 8), dtype=np.uint32)
    d = np.asarray(hamming.hamming_pairwise(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_array_equal(d, 0)


def test_stereo_frontend_depth_accuracy():
    """Stereo matches on the synthetic scene must recover metric depth of the
    splatted structure points."""
    cam = CameraConfig()
    scene = make_scene(n_frames=1, n_points=1500, n_objects=0, seed=11, camera=cam)
    renderer = SyntheticRenderer(scene)
    left, right, _ = renderer.render(0)
    fe = StereoFrontend(cam.height, cam.width, cam.fx, cam.bf)
    frame = fe(left, right)

    v = np.asarray(frame.valid) & (np.asarray(frame.depth) > 0)
    n_stereo = int(v.sum())
    assert n_stereo > 100, f"too few stereo matches: {n_stereo}"

    # ground truth: project scene points, compare depth at matching pixels
    T_cw = np.linalg.inv(scene.poses_world[0])
    pts_c = (T_cw[:3, :3] @ scene.points_world.T).T + T_cw[:3, 3]
    z = pts_c[:, 2]
    ok = z > 0.25
    u = cam.fx * pts_c[ok, 0] / z[ok] + cam.cx
    vv = cam.fy * pts_c[ok, 1] / z[ok] + cam.cy
    gt_uvz = np.stack([u, vv, z[ok]], axis=1)

    xy = np.asarray(frame.xy)[v]
    depth = np.asarray(frame.depth)[v]
    # match each stereo feature to nearest GT projection
    errs = []
    for (x, y), d in zip(xy, depth):
        dist2 = (gt_uvz[:, 0] - x) ** 2 + (gt_uvz[:, 1] - y) ** 2
        j = np.argmin(dist2)
        if dist2[j] < 2.0 ** 2 and gt_uvz[j, 2] < 40:
            errs.append(abs(d - gt_uvz[j, 2]) / gt_uvz[j, 2])
    errs = np.array(errs)
    assert len(errs) > 50, f"too few depth-verifiable matches: {len(errs)}"
    assert np.median(errs) < 0.05, f"median relative depth error {np.median(errs):.3f}"


def test_stereo_invalid_has_negative_depth():
    cam = CameraConfig()
    scene = make_scene(n_frames=1, n_points=500, n_objects=0, seed=12)
    renderer = SyntheticRenderer(scene)
    left, right, _ = renderer.render(0)
    fe = StereoFrontend(cam.height, cam.width, cam.fx, cam.bf)
    frame = fe(left, right)
    v = np.asarray(frame.valid)
    d = np.asarray(frame.depth)
    assert np.all(d[~v] <= 0)
