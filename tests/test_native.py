"""Native C++ runtime library vs pure-Python oracles."""

import numpy as np
import pytest

from pointslot_tpu import native


def test_native_builds():
    assert native.available(), "native library failed to build"
    lib = native.load()
    assert lib.native_abi_version() == 1


def test_covis_graph_matches_bruteforce(rng):
    P, K = 200, 16
    g = native.CovisGraph(P, K)
    obs = np.zeros((P, K), bool)
    # random insertions and deletions
    for _ in range(2000):
        p = int(rng.integers(P)); k = int(rng.integers(K))
        if rng.uniform() < 0.7:
            g.add_obs(p, k); obs[p, k] = True
        else:
            g.remove_obs(p, k); obs[p, k] = False
    for _ in range(5):
        p = int(rng.integers(P))
        g.remove_point(p); obs[p, :] = False
    kf_gone = int(rng.integers(K))
    g.remove_kf(kf_gone); obs[:, kf_gone] = False

    for kf in range(K):
        got = g.weights_of(kf)
        col = obs[:, kf]
        want = obs[col].sum(axis=0).astype(np.int32)
        want[kf] = 0  # the graph keeps no self-weight
        np.testing.assert_array_equal(got, want, err_msg=f"kf {kf}")


def test_covis_top(rng):
    g = native.CovisGraph(100, 8)
    # kf 0 shares 5 points with kf 1, 3 with kf 2
    for p in range(5):
        g.add_obs(p, 0); g.add_obs(p, 1)
    for p in range(5, 8):
        g.add_obs(p, 0); g.add_obs(p, 2)
    ids, ws = g.top(0, min_weight=1, n=8)
    assert list(ids[:2]) == [1, 2]
    assert list(ws[:2]) == [5, 3]


def test_hungarian_matches_scipy(rng):
    from scipy.optimize import linear_sum_assignment

    for _ in range(20):
        R = int(rng.integers(1, 12))
        C = int(rng.integers(R, 15))
        cost = rng.uniform(0, 10, size=(R, C))
        ours = native.hungarian(cost)
        rows, cols = linear_sum_assignment(cost)
        ref = np.full(R, -1, np.int64)
        ref[rows] = cols
        # optimal value must match (assignments may tie)
        np.testing.assert_allclose(
            cost[np.arange(R), ours].sum(), cost[np.arange(R), ref].sum(),
            atol=1e-9,
        )
        assert len(np.unique(ours)) == R  # valid assignment


def test_hamming_nn_matches_numpy(rng):
    a = rng.integers(0, 2 ** 32, size=(37, 8), dtype=np.uint32)
    b = rng.integers(0, 2 ** 32, size=(53, 8), dtype=np.uint32)
    idx, dist = native.hamming_nn(a, b)
    bits_a = np.unpackbits(a.view(np.uint8), axis=1)
    bits_b = np.unpackbits(b.view(np.uint8), axis=1)
    d = (bits_a[:, None, :] != bits_b[None, :, :]).sum(-1)
    np.testing.assert_array_equal(dist, d.min(axis=1))
    np.testing.assert_array_equal(d[np.arange(37), idx], d.min(axis=1))


def test_map_capacity_graceful(rng):
    """Keyframe eviction + point-table saturation must not crash."""
    from pointslot_tpu.slam.map_state import MapState

    m = MapState(max_kfs=4, max_points=64, feats_per_kf=16)
    for i in range(6):
        k = m.alloc_keyframe()
        m.kf_frame_id[k] = i
        pts = m.alloc_points(20)
        assert len(pts) <= 20
        if len(pts):
            m.bind(k, np.arange(min(len(pts), 16)), pts[:16])
    assert m.n_keyframes() <= 4
    # oldest keyframe survives eviction (gauge anchor)
    assert 0 in [int(m.kf_frame_id[k]) for k in m.keyframe_ids()]
