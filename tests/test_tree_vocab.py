"""Hierarchical (tree) vocabulary + sparse inverted-index database —
the ORBvoc-scale place-recognition path (reference Thirdparty/DBoW2/
DBoW2/TemplatedVocabulary.h:1343 tree descent, src/KeyFrameDatabase.cc
inverted index)."""

import numpy as np
import pytest

from pointslot_tpu.vocab.bow import (
    BinaryVocabulary, load_orb_vocab_binary, load_vocab,
    save_orb_vocab_binary,
)
from pointslot_tpu.vocab.tree import SparseKeyFrameDatabase, TreeVocabulary


def random_desc(rng, n):
    return rng.integers(0, 2 ** 32, size=(n, 8), dtype=np.uint32)


def flip_bits(rng, desc, n_bits):
    out = desc.copy()
    for i in range(len(out)):
        for b in rng.choice(256, n_bits, replace=False):
            out[i, b // 32] ^= np.uint32(1) << np.uint32(b % 32)
    return out


def make_perturbation_tree(rng, k=10, depth=5, flips=(100, 24, 12, 6, 3)):
    """Top-down synthetic tree: each node's descriptor is its parent's with
    a few bit flips (fewer at deeper levels) — greedy descent from any leaf
    descriptor follows its own ancestor path."""
    node_desc = [np.zeros(8, np.uint32)]
    children = [[]]
    level_nodes = [0]
    for lvl in range(depth):
        next_nodes = []
        for node in level_nodes:
            base = node_desc[node][None]
            kids = np.concatenate(
                [flip_bits(rng, base if lvl else random_desc(rng, 1),
                           flips[lvl]) for _ in range(k)]
            )
            for kd in kids:
                node_desc.append(kd)
                children.append([])
                cid = len(node_desc) - 1
                children[node].append(cid)
                next_nodes.append(cid)
        level_nodes = next_nodes
    T = len(node_desc)
    ch = np.full((T, k), -1, np.int32)
    for i, cs in enumerate(children):
        ch[i, : len(cs)] = cs
    is_leaf = np.array([len(c) == 0 for c in children], bool)
    return TreeVocabulary(np.stack(node_desc), ch,
                          np.ones(T, np.float32), is_leaf, k, depth)


def test_tree_train_transform_consistency(rng):
    desc = random_desc(rng, 600)
    vocab = TreeVocabulary.train(desc, k=6, depth=3, seed=0)
    assert vocab.n_words > 50
    words1 = vocab.word_ids(desc[:100], np.ones(100, bool))
    words2 = vocab.word_ids(desc[:100], np.ones(100, bool))
    np.testing.assert_array_equal(words1, words2)
    assert np.all(words1 >= 0)
    uw, wt = vocab.bow_vector(desc[:100], np.ones(100, bool))
    assert np.all(np.diff(uw) > 0)
    np.testing.assert_allclose(wt.sum(), 1.0, atol=1e-5)
    # invalid features drop out
    v = np.zeros(100, bool)
    uw2, _ = vocab.bow_vector(desc[:100], v)
    assert len(uw2) == 0


def test_tree_descent_follows_ancestry():
    rng = np.random.default_rng(7)
    vocab = make_perturbation_tree(rng, k=6, depth=3, flips=(100, 16, 8))
    leaf_nodes = np.nonzero(vocab.is_leaf)[0]
    probe = leaf_nodes[:: max(len(leaf_nodes) // 64, 1)]
    desc = vocab.node_desc[probe]
    words = vocab.word_ids(desc, np.ones(len(desc), bool))
    want = vocab.leaf_word[probe]
    # greedy descent must land on the exact leaf for (nearly) every exact
    # leaf descriptor
    assert (words == want).mean() > 0.95


@pytest.mark.slow
def test_tree_vocab_100k_scale(tmp_path):
    """10^5-leaf mechanics with bounded memory: binary save/load keeps the
    tree (no dense (N, W) table anywhere), transform + database query run.
    ~111k nodes (k=10, depth=5) — the same order as the real ORBvoc."""
    rng = np.random.default_rng(3)
    vocab = make_perturbation_tree(rng, k=10, depth=5,
                                   flips=(110, 40, 20, 10, 5))
    assert vocab.n_words == 10 ** 5
    path = str(tmp_path / "big.bin")
    vocab.save_binary(path)
    loaded = load_vocab(path)   # auto: > threshold -> tree
    assert isinstance(loaded, TreeVocabulary)
    assert loaded.n_words == vocab.n_words

    # word assignment survives the round-trip
    leaf_nodes = np.nonzero(vocab.is_leaf)[0]
    probe = rng.choice(leaf_nodes, 256, replace=False)
    desc = vocab.node_desc[probe]
    w_a = vocab.word_ids(desc, np.ones(256, bool))
    w_b = loaded.word_ids(desc, np.ones(256, bool))
    assert (w_a == w_b).mean() > 0.99

    # sparse database: the re-observed descriptor set scores highest
    db = SparseKeyFrameDatabase(loaded, max_kfs=64)
    sets = [vocab.node_desc[rng.choice(leaf_nodes, 300, replace=False)]
            for _ in range(6)]
    for i, s in enumerate(sets):
        db.add(i, s, np.ones(len(s), bool))
    noisy = flip_bits(rng, sets[2][:200], 4)
    vec = db.transform(noisy, np.ones(len(noisy), bool))
    hits = db.query(vec, exclude=set(), min_score=0.01)
    assert hits and hits[0] == 2
    # memory sanity: the database holds sparse entries, not a (K, W) matrix
    assert sum(len(w) for w, _ in db._kf.values()) < 64 * 1300


def test_sparse_db_score_matches_dense(rng):
    """Sparse inverted-index scoring == dense L1 similarity on the same
    vocabulary (score identity: 1 - 0.5*sum|a-b| == sum min(a_i, b_i))."""
    desc = random_desc(rng, 400)
    tree = TreeVocabulary.train(desc, k=5, depth=3, seed=1)
    db = SparseKeyFrameDatabase(tree, max_kfs=16)
    a, b = desc[:120], desc[120:260]
    db.add(0, a, np.ones(len(a), bool))
    vec = db.transform(b, np.ones(len(b), bool))

    def dense(words, weights):
        v = np.zeros(tree.n_words, np.float64)
        v[words] = weights
        return v

    va = dense(*db._kf[0])
    vb = dense(*vec)
    want = 1.0 - 0.5 * np.abs(va - vb).sum()
    got = db.pair_score(0, vec)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # removal empties the posting lists
    db.remove(0)
    assert db.query(vec, set(), 0.0) == []
    assert not db._inv


def test_loop_closure_with_tree_vocab(tmp_path):
    """End-to-end: a tree vocabulary loaded through the DBoW2 binary format
    drives loop detection (VERDICT r2 item 2 'Done' criterion)."""
    from pointslot_tpu.config import SystemConfig
    from pointslot_tpu.datasets.synthetic import (
        SyntheticRenderer, make_loop_scene,
    )
    from pointslot_tpu.ops.orb import ORBExtractor
    from pointslot_tpu.slam.system import System
    from pointslot_tpu.slam.tracking import TrackingState
    from pointslot_tpu.vocab.tree import SparseKeyFrameDatabase

    scene = make_loop_scene(n_frames=48, seed=41, radius=7.0)
    renderer = SyntheticRenderer(scene)

    # train a tree vocabulary on descriptors from a few scene frames and
    # ship it through the binary format
    cam = SystemConfig().camera
    ext = ORBExtractor(cam.height, cam.width)
    all_desc = []
    for i in (0, 16, 32):
        left, _, _ = renderer.render(i)
        f = ext(left)
        all_desc.append(np.asarray(f.desc)[np.asarray(f.valid)])
    tree = TreeVocabulary.train(np.concatenate(all_desc), k=8, depth=3,
                                seed=0)
    path = str(tmp_path / "voc.bin")
    tree.save_binary(path)

    cfg = SystemConfig()
    cfg = cfg.replace(loop=cfg.loop.__class__(
        **{**cfg.loop.__dict__, "vocab_path": path, "vocab_as_tree": True}))
    system = System(cfg)
    assert isinstance(system.loop_closer.db, SparseKeyFrameDatabase)
    for i in range(scene.n_frames):
        left, right, _ = renderer.render(i)
        system.track_stereo(left, right, timestamp=i * 0.1, frame_id=i)
    assert system.tracker.state == TrackingState.OK
    assert system.loop_closer.loops_closed >= 1, (
        "no loop closure fired with the tree vocabulary"
    )
    traj = system.camera_trajectory()
    f0 = traj[0][0]
    A = scene.poses_world[f0]
    errs = [
        np.linalg.norm((A @ np.linalg.inv(T))[:3, 3]
                       - scene.poses_world[f][:3, 3])
        for f, T, _ in traj
    ]
    ate = float(np.sqrt(np.mean(np.square(errs))))
    assert ate < 0.25, f"ATE with tree vocab {ate:.3f} m"
