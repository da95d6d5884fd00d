import numpy as np
import jax.numpy as jnp

from pointslot_tpu.config import ORBConfig
from pointslot_tpu.datasets.synthetic import SyntheticRenderer, make_scene
from pointslot_tpu.ops import fast as fast_ops
from pointslot_tpu.ops.orb import ORBExtractor, level_budgets


def reference_fast9(img, threshold):
    """Brute-force FAST-9/16 oracle (numpy, slow, small images only)."""
    h, w = img.shape
    out = np.zeros((h, w), np.float32)
    circle = fast_ops.CIRCLE
    for y in range(3, h - 3):
        for x in range(3, w - 3):
            c = img[y, x]
            diffs = np.array([img[y + dy, x + dx] - c for dy, dx in circle])
            ext = np.concatenate([diffs, diffs[:8]])
            best = 0.0
            for s in range(16):
                arc = ext[s : s + 9]
                best = max(best, arc.min(), (-arc).min())
            if best > threshold:
                out[y, x] = best
    return out


def test_fast_score_matches_bruteforce(rng):
    img = (rng.uniform(0, 255, size=(32, 40))).astype(np.float32)
    got = np.asarray(fast_ops.fast_score_map(jnp.asarray(img), 10.0))
    want = reference_fast9(img, 10.0)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_fast_detects_synthetic_corner():
    img = np.zeros((32, 32), np.float32)
    img[10:20, 10:20] = 200.0  # a bright square: corners at its corners
    score = np.asarray(fast_ops.fast_score_map(jnp.asarray(img), 20.0))
    assert score[10, 10] > 0 or score[10, 11] > 0 or score[11, 10] > 0


def test_nms_keeps_single_peak():
    s = np.zeros((16, 16), np.float32)
    s[5, 5] = 10.0
    s[5, 6] = 8.0
    s[6, 5] = 9.0
    out = np.asarray(fast_ops.nms3x3(jnp.asarray(s)))
    assert out[5, 5] == 10.0
    assert out[5, 6] == 0.0
    assert out[6, 5] == 0.0


def test_level_budgets_sum():
    b = level_budgets(1000, 8, 1.2)
    assert sum(b) == 1000
    assert b[0] > b[1] > b[-1] > 0


def test_extractor_on_synthetic_scene():
    scene = make_scene(n_frames=2, n_points=800, n_objects=1, seed=3)
    renderer = SyntheticRenderer(scene)
    left, right, _ = renderer.render(0)
    ext = ORBExtractor(left.shape[0], left.shape[1])
    feats = ext(left)
    n = int(np.asarray(feats.n))
    assert n > 300, f"expected plenty of features, got {n}"
    assert feats.xy.shape == (ext.capacity, 2)
    v = np.asarray(feats.valid)
    xy = np.asarray(feats.xy)[v]
    assert np.all(xy[:, 0] >= 0) and np.all(xy[:, 0] < left.shape[1])
    assert np.all(xy[:, 1] >= 0) and np.all(xy[:, 1] < left.shape[0])
    # descriptors should not all be equal
    desc = np.asarray(feats.desc)[v]
    assert len(np.unique(desc, axis=0)) > len(desc) * 0.8


def test_extractor_descriptor_rotation_stability(rng):
    """Descriptors of the same (synthetic, rotationally-sampled) patch should
    be similar under small in-plane rotation (steering compensation)."""
    scene = make_scene(n_frames=2, n_points=600, seed=5)
    renderer = SyntheticRenderer(scene)
    left, _, _ = renderer.render(0)
    ext = ORBExtractor(left.shape[0], left.shape[1])
    f0 = ext(left)
    f1 = ext(left)  # determinism check
    np.testing.assert_array_equal(np.asarray(f0.desc), np.asarray(f1.desc))
    np.testing.assert_array_equal(np.asarray(f0.xy), np.asarray(f1.xy))


def test_masked_extraction():
    scene = make_scene(n_frames=1, n_points=800, seed=7)
    renderer = SyntheticRenderer(scene)
    left, _, _ = renderer.render(0)
    gate = np.zeros(left.shape, bool)
    gate[:, : left.shape[1] // 2] = True  # only left half allowed
    ext = ORBExtractor(left.shape[0], left.shape[1])
    feats = ext(left, gate=gate)
    v = np.asarray(feats.valid)
    xy = np.asarray(feats.xy)[v]
    assert np.all(xy[:, 0] <= left.shape[1] // 2 + 2)


def test_frontend_batch_matches_single():
    """Batched (vmap) frontend equals per-frame results frame by frame."""
    import jax.numpy as jnp

    from pointslot_tpu.config import CameraConfig, ORBConfig
    from pointslot_tpu.datasets.synthetic import SyntheticRenderer, make_scene
    from pointslot_tpu.ops.frontend import StereoFrontend

    cam = CameraConfig()
    scene = make_scene(n_frames=3, n_points=1500, n_objects=0, seed=5, camera=cam)
    r = SyntheticRenderer(scene)
    pairs = [r.render(i)[:2] for i in range(3)]
    fe = StereoFrontend(cam.height, cam.width, cam.fx, cam.bf, ORBConfig())
    lefts = jnp.stack([jnp.asarray(l, jnp.uint8) for l, _ in pairs])
    rights = jnp.stack([jnp.asarray(rt, jnp.uint8) for _, rt in pairs])
    fb = fe.batch(lefts, rights)
    for i in range(3):
        f1 = fe(lefts[i], rights[i])
        np.testing.assert_array_equal(np.asarray(fb.valid[i]), np.asarray(f1.valid))
        np.testing.assert_array_equal(np.asarray(fb.desc[i]), np.asarray(f1.desc))
        np.testing.assert_allclose(np.asarray(fb.xy[i]), np.asarray(f1.xy),
                                   atol=1e-4)
        # SAD sub-pixel refinement may flip ties under vmap's different
        # fusion order; require near-exact depth on >99% of features
        d_b, d_1 = np.asarray(fb.depth[i]), np.asarray(f1.depth)
        frac_diff = np.mean(np.abs(d_b - d_1) > 1e-2)
        assert frac_diff < 0.01, f"{frac_diff:.3%} depths differ"


def test_learned_pattern_table_integrity():
    """The learned rBRIEF table: 256 pairs, coords within the sampling
    radius (reference src/ORBextractor.cc:150-406)."""
    from pointslot_tpu.ops.orb import brief_pattern

    pat = brief_pattern("learned")
    assert pat.shape == (256, 4)
    assert pat.dtype == np.int32
    assert pat.min() >= -13 and pat.max() <= 12
    # first and last rows of the published table
    np.testing.assert_array_equal(pat[0], [8, -3, 9, 5])
    np.testing.assert_array_equal(pat[-1], [-1, -6, 0, -11])
    # no degenerate pairs (a == b samples would yield constant bits)
    assert not np.any(np.all(pat[:, 0:2] == pat[:, 2:4], axis=1))


def test_learned_pattern_beats_gaussian_bit_correlation():
    """A/B: descriptor bits from the learned table should be closer to
    fair coins (mean ~0.5) and less inter-correlated than the seeded
    Gaussian pattern — the property the greedy training optimized for."""
    scene = make_scene(n_frames=1, n_points=900, seed=11)
    renderer = SyntheticRenderer(scene)
    left, _, _ = renderer.render(0)

    def bit_stats(kind):
        ext = ORBExtractor(left.shape[0], left.shape[1],
                           ORBConfig(brief_pattern=kind))
        feats = ext(left)
        v = np.asarray(feats.valid)
        desc = np.asarray(feats.desc)[v]                      # (N, 8) uint32
        bits = ((desc[:, :, None] >> np.arange(32)[None, None, :]) & 1)
        bits = bits.reshape(len(desc), 256).astype(np.float64)
        mean_dev = np.abs(bits.mean(0) - 0.5).mean()
        c = np.corrcoef(bits.T)
        c = np.nan_to_num(c) - np.eye(256)
        mean_abs_corr = np.abs(c).mean()
        return mean_dev, mean_abs_corr

    dev_l, corr_l = bit_stats("learned")
    dev_g, corr_g = bit_stats("gaussian")
    assert corr_l < corr_g, (corr_l, corr_g)
    assert dev_l <= dev_g + 0.02, (dev_l, dev_g)


def test_learned_pattern_match_quality():
    """Learned-pattern descriptors still match across a real baseline shift
    with a high geometric inlier rate."""
    from pointslot_tpu.slam.matchers import brute_match

    scene = make_scene(n_frames=2, n_points=900, seed=11)
    renderer = SyntheticRenderer(scene)
    l0, r0, _ = renderer.render(0)
    ext = ORBExtractor(l0.shape[0], l0.shape[1], ORBConfig())
    fa, fb = ext(l0), ext(r0)
    res = brute_match(fa.desc, fa.angle, fa.valid, fb.desc, fb.angle, fb.valid)
    idx = np.asarray(res.idx_b_for_a)
    m = idx >= 0
    assert m.sum() > 50, f"too few matches: {m.sum()}"
    # stereo pair: matched features must lie on (nearly) the same row
    dy = np.asarray(fa.xy)[m, 1] - np.asarray(fb.xy)[idx[m], 1]
    assert np.mean(np.abs(dy) < 2.0) > 0.8, "row consistency too low"
