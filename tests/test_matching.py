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
    """Stereo matches on the synthetic scene must recover the renderer's
    ground-truth depth map."""
    cam = CameraConfig()
    scene = make_scene(n_frames=1, n_points=1500, n_objects=0, seed=11, camera=cam)
    renderer = SyntheticRenderer(scene)
    left, right, _, gt_depth = renderer.render_with_depth(0)
    fe = StereoFrontend(cam.height, cam.width, cam.fx, cam.bf)
    frame = fe(left, right)

    v = np.asarray(frame.valid) & (np.asarray(frame.depth) > 0)
    n_stereo = int(v.sum())
    assert n_stereo > 100, f"too few stereo matches: {n_stereo}"

    xy = np.asarray(frame.xy)[v]
    depth = np.asarray(frame.depth)[v]
    errs = []
    for (x, y), d in zip(xy, depth):
        xi, yi = int(round(x)), int(round(y))
        win = gt_depth[max(yi - 2, 0) : yi + 3, max(xi - 2, 0) : xi + 3]
        gt = np.median(win)
        # skip depth discontinuities and far geometry
        if gt > 40 or (win.max() - win.min()) > 0.5 * gt:
            continue
        errs.append(abs(d - gt) / gt)
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
