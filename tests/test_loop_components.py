import numpy as np
import jax
import jax.numpy as jnp

from pointslot_tpu.geometry import pnp, se3
from pointslot_tpu.solvers import posegraph
from pointslot_tpu.vocab.bow import BinaryVocabulary


def random_desc(rng, n):
    return rng.integers(0, 2 ** 32, size=(n, 8), dtype=np.uint32)


def perturb_desc(rng, desc, n_bits):
    """Flip n_bits random bits per descriptor."""
    out = desc.copy()
    for i in range(len(out)):
        for _ in range(n_bits):
            w = rng.integers(0, 8)
            b = rng.integers(0, 32)
            out[i, w] ^= np.uint32(1) << np.uint32(b)
    return out


def test_vocab_similar_images_score_high(rng):
    base = random_desc(rng, 400)
    vocab = BinaryVocabulary.train(base, n_words=64, iters=5)
    v1, _ = vocab.transform(base[:200], np.ones(200, bool))
    v2, _ = vocab.transform(perturb_desc(rng, base[:200], 8), np.ones(200, bool))
    v3, _ = vocab.transform(random_desc(rng, 200), np.ones(200, bool))
    s_same = float(BinaryVocabulary.score(v1, v2))
    s_diff = float(BinaryVocabulary.score(v1, v3))
    assert s_same > s_diff + 0.1, f"{s_same=} {s_diff=}"


def test_vocab_word_assignment_stable(rng):
    base = random_desc(rng, 300)
    vocab = BinaryVocabulary.train(base, n_words=32)
    _, w1 = vocab.transform(base[:50], np.ones(50, bool))
    _, w2 = vocab.transform(base[:50], np.ones(50, bool))
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))


def test_rigid_ransac(rng):
    src = rng.uniform(-5, 5, size=(100, 3)).astype(np.float32)
    R = np.asarray(se3.so3_exp(jnp.asarray([0.2, -0.1, 0.3], jnp.float32)))
    t = np.array([1.0, 2.0, -0.5], np.float32)
    dst = src @ R.T + t
    dst[:30] += rng.uniform(2, 5, size=(30, 3))  # outliers
    res = pnp.rigid_ransac(
        jnp.asarray(src), jnp.asarray(dst), jnp.ones(100, bool),
        jax.random.PRNGKey(1),
    )
    assert bool(res.ok)
    assert int(res.n_inliers) >= 65
    np.testing.assert_allclose(np.asarray(res.T[:3, :3]), R, atol=1e-3)
    np.testing.assert_allclose(np.asarray(res.T[:3, 3]), t, atol=1e-2)


def make_loop_problem(rng, K=20, drift=0.02):
    """Circular trajectory with odometry drift + one loop-closure edge."""
    poses_true = []
    T = np.eye(4)
    step_xi = np.array([0.0, 0, 0.5, 0, 2 * np.pi / K, 0], np.float32)
    for _ in range(K):
        poses_true.append(T.copy())
        T = np.asarray(se3.se3_exp(jnp.asarray(step_xi))) @ T

    e_i, e_j, meas, weight = [], [], [], []
    poses_noisy = [poses_true[0]]
    for k in range(1, K):
        M_true = poses_true[k] @ np.linalg.inv(poses_true[k - 1])
        noise = np.asarray(
            se3.se3_exp(jnp.asarray(rng.normal(size=6) * drift, jnp.float32))
        )
        M_noisy = noise @ M_true
        poses_noisy.append(M_noisy @ poses_noisy[-1])
        e_i.append(k); e_j.append(k - 1)
        meas.append(M_noisy); weight.append(1.0)
    # loop edge: exact relative pose between last and first
    e_i.append(K - 1); e_j.append(0)
    meas.append(poses_true[K - 1] @ np.linalg.inv(poses_true[0]))
    weight.append(50.0)

    prob = posegraph.PoseGraphProblem(
        poses=jnp.asarray(np.stack(poses_noisy), jnp.float32),
        fixed=jnp.asarray(np.arange(K) == 0),
        valid=jnp.ones(K, bool),
        e_i=jnp.asarray(e_i, jnp.int32),
        e_j=jnp.asarray(e_j, jnp.int32),
        e_meas=jnp.asarray(np.stack(meas), jnp.float32),
        e_weight=jnp.asarray(weight, jnp.float32),
        e_valid=jnp.ones(len(e_i), bool),
    )
    return prob, np.stack(poses_true), np.stack(poses_noisy)


def test_pose_graph_closes_loop(rng):
    prob, poses_true, poses_noisy = make_loop_problem(rng)

    def rmse(poses):
        errs = [
            np.linalg.norm(np.asarray(p)[:3, 3] - t[:3, 3])
            for p, t in zip(poses, poses_true)
        ]
        return float(np.sqrt(np.mean(np.square(errs))))

    before = rmse(poses_noisy)
    out = posegraph.optimize_pose_graph(prob, n_iters=20)
    after = rmse(np.asarray(out))
    # drift is redistributed (absolute RMSE bounded by odometry noise, not
    # zero — one loop edge can't fix 19 noisy edges; it closes the loop)
    assert after < before * 0.75, f"{before=} {after=}"
    # the heavily-weighted loop edge must now be (nearly) satisfied
    M = np.asarray(out[-1]) @ np.linalg.inv(np.asarray(out[0]))
    M_true = poses_true[-1] @ np.linalg.inv(poses_true[0])
    err = np.asarray(
        se3.se3_log(jnp.asarray(np.linalg.inv(M_true) @ M, jnp.float32))
    )
    assert np.linalg.norm(err) < 0.05
    # end-point drift before optimization must exceed it substantially
    M0 = poses_noisy[-1] @ np.linalg.inv(poses_noisy[0])
    err0 = np.asarray(
        se3.se3_log(jnp.asarray(np.linalg.inv(M_true) @ M0, jnp.float32))
    )
    assert np.linalg.norm(err0) > 3 * np.linalg.norm(err)


def test_binary_vocab_roundtrip(tmp_path, rng):
    """DBoW2 binary layout (reference TemplatedVocabulary.h:1343): leaves
    and their weights survive a save/load round-trip; word assignment
    matches a vocabulary built directly from the leaf descriptors."""
    from pointslot_tpu.vocab.bow import (
        load_orb_vocab_binary, load_vocab, save_orb_vocab_binary,
    )

    n_nodes, n_leaves = 40, 24
    is_leaf = np.zeros(n_nodes, bool)
    is_leaf[-n_leaves:] = True
    desc_u32 = random_desc(rng, n_nodes)
    desc_u8 = desc_u32.view(np.uint8)
    parents = np.concatenate([np.zeros(n_nodes - n_leaves, np.int32),
                              np.arange(n_leaves, dtype=np.int32) % 4])
    weights = rng.uniform(0.1, 2.0, n_nodes).astype(np.float32)
    path = str(tmp_path / "voc.bin")
    save_orb_vocab_binary(path, parents, desc_u8, weights, is_leaf)

    vocab = load_orb_vocab_binary(path)
    assert vocab.n_words == n_leaves
    np.testing.assert_array_equal(vocab.words, desc_u32[is_leaf])
    np.testing.assert_allclose(vocab.idf, weights[is_leaf], rtol=1e-6)

    # extension dispatch + functional use
    vocab2 = load_vocab(path)
    q = perturb_desc(rng, desc_u32[is_leaf][:8], 2)
    _, w = vocab2.transform(q, np.ones(8, bool))
    assert (np.asarray(w) == np.arange(8)).mean() >= 0.75


def test_binary_vocab_gzip(tmp_path, rng):
    """.bin.gz vocabularies decompress through the same loader."""
    import gzip

    from pointslot_tpu.vocab.bow import load_vocab, save_orb_vocab_binary

    n = 10
    desc = random_desc(rng, n).view(np.uint8)
    path = str(tmp_path / "voc.bin")
    save_orb_vocab_binary(path, np.zeros(n, np.int32), desc,
                          np.ones(n, np.float32), np.ones(n, bool))
    gz = path + ".gz"
    with open(path, "rb") as f, gzip.open(gz, "wb") as g:
        g.write(f.read())
    vocab = load_vocab(gz)
    assert vocab.n_words == n
