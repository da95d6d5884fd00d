"""Bag-of-binary-words place recognition as batched matmul lookup.

Replaces DBoW2 (reference Thirdparty/DBoW2: TemplatedVocabulary<FORB> with
a k^L tree, BowVector, FeatureVector, inverted index). TPU-native
re-design: at SLOT scale a FLAT vocabulary of ~1k binary words is
equivalent to the 10^6-word tree's useful resolution, and word assignment
becomes ONE Hamming argmin — an int8 MXU matmul (ops/hamming.py) — instead
of a tree descent. Keyframe similarity is a dense dot product of tf-idf
vectors, so a whole-database query is one (K, W) x (W,) matvec.

Training: binary k-means (majority-vote centroids) over sample descriptors;
the reference instead ships a 140 MB pre-trained vocabulary binary
(loadFromBinaryFile, reference src/System.cc:79) — load_orb_vocab_text can
ingest that format's text export when available.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pointslot_tpu.ops.hamming import hamming_table_popcount


def _unpack_bits(desc: np.ndarray) -> np.ndarray:
    """(N, 8) uint32 -> (N, 256) {0,1} uint8."""
    shifts = np.arange(32, dtype=np.uint32)
    bits = (desc[:, :, None] >> shifts[None, None, :]) & 1
    return bits.reshape(desc.shape[0], 256).astype(np.uint8)


def _pack_bits(bits: np.ndarray) -> np.ndarray:
    """(N, 256) {0,1} -> (N, 8) uint32."""
    b = bits.reshape(-1, 8, 32).astype(np.uint32)
    shifts = np.arange(32, dtype=np.uint32)
    return (b << shifts[None, None, :]).sum(axis=2, dtype=np.uint32)


class BinaryVocabulary:
    def __init__(self, words: np.ndarray, idf: Optional[np.ndarray] = None):
        self.words = np.asarray(words, np.uint32)          # (W, 8)
        self.n_words = len(self.words)
        self.idf = (
            np.asarray(idf, np.float32)
            if idf is not None
            else np.ones(self.n_words, np.float32)
        )
        self._words_j = jnp.asarray(self.words)
        self._idf_j = jnp.asarray(self.idf)
        self._transform = jax.jit(self._transform_impl)

    # ------------------------------------------------------------------
    @classmethod
    def train(cls, descriptors: np.ndarray, n_words: int = 512, iters: int = 8,
              seed: int = 0) -> "BinaryVocabulary":
        """Binary k-means: Hamming assignment + per-bit majority centroids."""
        rng = np.random.default_rng(seed)
        desc = np.unique(descriptors, axis=0)
        if len(desc) < n_words:
            reps = -(-n_words // max(len(desc), 1))
            desc = np.tile(desc, (reps, 1))[: max(n_words, len(desc))]
        centroids = desc[rng.choice(len(desc), n_words, replace=False)]
        bits = _unpack_bits(desc)
        for _ in range(iters):
            d = np.asarray(
                hamming_table_popcount(jnp.asarray(desc), jnp.asarray(centroids))
            )
            assign = d.argmin(axis=1)
            new_centroids = centroids.copy()
            for w in range(n_words):
                members = bits[assign == w]
                if len(members) == 0:
                    new_centroids[w] = desc[rng.integers(len(desc))]
                else:
                    new_centroids[w] = _pack_bits(
                        (members.mean(axis=0) > 0.5)[None, :].astype(np.uint8)
                    )[0]
            if np.array_equal(new_centroids, centroids):
                break
            centroids = new_centroids
        # idf from training distribution
        d = np.asarray(
            hamming_table_popcount(jnp.asarray(desc), jnp.asarray(centroids))
        )
        assign = d.argmin(axis=1)
        counts = np.bincount(assign, minlength=n_words).astype(np.float64)
        idf = np.log(len(desc) / np.maximum(counts, 1.0)).astype(np.float32)
        return cls(centroids, idf)

    # ------------------------------------------------------------------
    def _transform_impl(self, desc: jnp.ndarray, valid: jnp.ndarray):
        d = hamming_table_popcount(desc, self._words_j)     # (N, W)
        word = jnp.argmin(d, axis=1)
        v = jnp.zeros((self.n_words,), jnp.float32).at[
            jnp.where(valid, word, self.n_words)
        ].add(1.0, mode="drop")
        v = v * self._idf_j
        n = jnp.linalg.norm(v, ord=1)
        v = v / jnp.maximum(n, 1e-9)
        return v, word.astype(jnp.int32)

    def transform(self, desc, valid):
        """(N, 8) descriptors -> (L1-normalized tf-idf (W,), word ids (N,))."""
        return self._transform(jnp.asarray(desc), jnp.asarray(valid))

    @staticmethod
    def score(v1: jnp.ndarray, v2: jnp.ndarray) -> jnp.ndarray:
        """DBoW2 L1 similarity in [0, 1]:
        s = 1 - 0.5 * sum |v1/|v1| - v2/|v2||  (vectors already normalized)."""
        return 1.0 - 0.5 * jnp.sum(jnp.abs(v1 - v2), axis=-1)


_default_vocab_cache = {}


def train_default_vocab(seed: int = 0, n_words: int = 512,
                        cache_dir: str = ".cache") -> BinaryVocabulary:
    """Train a vocabulary from ORB descriptors of synthetic scenes — the
    self-contained substitute for the reference's shipped ORBvoc binary.
    Cached in-process and on disk."""
    import os

    key = (seed, n_words)
    if key in _default_vocab_cache:
        return _default_vocab_cache[key]
    path = os.path.join(cache_dir, f"vocab_s{seed}_w{n_words}.npz")
    if os.path.isfile(path):
        z = np.load(path)
        vocab = BinaryVocabulary(z["words"], z["idf"])
        _default_vocab_cache[key] = vocab
        return vocab

    from pointslot_tpu.config import CameraConfig, ORBConfig
    from pointslot_tpu.datasets.synthetic import SyntheticRenderer, make_scene
    from pointslot_tpu.ops.orb import ORBExtractor

    cam = CameraConfig()
    all_desc = []
    for s in range(2):
        scene = make_scene(n_frames=3, n_points=2000, n_objects=2, seed=seed + s)
        renderer = SyntheticRenderer(scene)
        ext = ORBExtractor(cam.height, cam.width, ORBConfig())
        for i in range(0, 3):
            left, _, _ = renderer.render(i)
            f = ext(jnp.asarray(left, jnp.float32))
            all_desc.append(np.asarray(f.desc)[np.asarray(f.valid)])
    vocab = BinaryVocabulary.train(
        np.concatenate(all_desc), n_words=n_words, seed=seed
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        np.savez(path, words=vocab.words, idf=vocab.idf)
    except OSError:
        pass
    _default_vocab_cache[key] = vocab
    return vocab


# Above this many words a dense (N_feat, W) assignment table / (K, W)
# database matrix stops being reasonable; loaders switch to the tree
# vocabulary (staged descent) + sparse inverted-index database.
TREE_WORD_THRESHOLD = 4096


def load_vocab(path: str, as_tree: Optional[bool] = None):
    """Load a DBoW2 vocabulary by format: .bin (optionally .bin.gz) binary
    layout (the file the reference loads at src/System.cc:79), anything
    else the text export. Returns a flat BinaryVocabulary for small files
    and a TreeVocabulary (vocab/tree.py staged descent) above
    TREE_WORD_THRESHOLD words; force with as_tree."""
    if path.endswith((".bin", ".bin.gz")):
        return load_orb_vocab_binary(path, as_tree=as_tree)
    return load_orb_vocab_text(path, as_tree=as_tree)


def load_orb_vocab_binary(path: str, as_tree: Optional[bool] = None,
                          strict: bool = False,
                          expect_sha256: Optional[str] = None):
    """Load a DBoW2 binary vocabulary (ORBvoc.bin — the format the reference
    loads at startup, src/System.cc:79 via TemplatedVocabulary::
    loadFromBinaryFile, Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:1343).

    Layout: 24-byte header (u32 nb_nodes, u32 size_node, i32 k, i32 L,
    i32 scoring, i32 weighting), then nb_nodes fixed-size records of
    size_node bytes: i32 parent | 32 descriptor bytes | f32 weight |
    u8 is_leaf. Only the leaves (words) are kept — the flat MXU lookup
    replaces the k^L tree descent. Accepts gzip-compressed files (.gz).

    ``strict`` additionally validates the tree's structural invariants
    (parent indices in range and topologically ordered, branching factor
    vs the header's k, finite non-negative weights, leaf count <= k^L) so
    a record-layout mismatch on a real ORBvoc.bin fails LOUDLY at load
    time instead of silently mis-parsing (data-day readiness: a wrong
    byte offset here would otherwise just degrade loop recall).
    ``expect_sha256`` pins the exact file (provenance check)."""
    if path.endswith(".gz"):
        import gzip

        with gzip.open(path, "rb") as f:
            raw = f.read()
    else:
        with open(path, "rb") as f:
            raw = f.read()
    if expect_sha256 is not None:
        import hashlib

        got = hashlib.sha256(raw).hexdigest()
        if got != expect_sha256.lower():
            raise ValueError(
                f"{path}: sha256 {got} != expected {expect_sha256}")
    if len(raw) < 24:
        raise ValueError(f"{path}: truncated vocabulary header")
    nb_nodes, size_node = np.frombuffer(raw[:8], np.uint32)
    if size_node < 41:
        raise ValueError(f"{path}: node record too small ({size_node} B)")
    body = raw[24 : 24 + int(nb_nodes) * int(size_node)]
    if len(body) < int(nb_nodes) * int(size_node):
        raise ValueError(f"{path}: expected {nb_nodes} nodes, file truncated")
    rec = np.frombuffer(body, np.uint8).reshape(int(nb_nodes), int(size_node))
    parents = rec[:, 0:4].copy().view(np.int32).ravel()
    desc = rec[:, 4:36]
    weight = rec[:, 36:40].copy().view(np.float32).ravel()
    is_leaf = rec[:, 40] != 0
    if not is_leaf.any():
        raise ValueError(f"{path}: vocabulary has no leaf words")
    n_words = int(is_leaf.sum())
    if strict:
        _validate_vocab_structure(path, raw, parents, weight, is_leaf)
    if as_tree or (as_tree is None and n_words > TREE_WORD_THRESHOLD):
        from pointslot_tpu.vocab.tree import TreeVocabulary

        k, L = np.frombuffer(raw[8:16], np.int32)
        return TreeVocabulary.from_parent_array(
            parents, np.ascontiguousarray(desc).view(np.uint32), weight,
            is_leaf, k=max(int(k), 2), depth=max(int(L), 1) + 1,
        )
    words = np.ascontiguousarray(desc[is_leaf]).view(np.uint32)
    return BinaryVocabulary(words, weight[is_leaf].astype(np.float32))


def _validate_vocab_structure(path, raw, parents, weight, is_leaf):
    """Strict-parse invariants of the DBoW2 node-record layout (see
    load_orb_vocab_binary). Raises ValueError with a precise diagnosis —
    the failure mode to catch is a plausible-looking but wrong byte
    offset, which corrupts every field at once."""
    n = len(parents)   # records = nodes 1..n; node 0 (the root) implicit
    k, L = (int(x) for x in np.frombuffer(raw[8:16], np.int32))
    problems = []
    if not (2 <= k <= 64):
        problems.append(f"branching factor k={k} implausible")
    if not (1 <= L <= 12):
        problems.append(f"depth L={L} implausible")
    # record i is node i+1; its parent FIELD is a node id (0 = root) that
    # must precede it — DBoW2 serializes parents before children
    node_ids = np.arange(1, n + 1)
    bad_parent = (parents < 0) | (parents >= node_ids)
    if bad_parent.any():
        i = int(np.argmax(bad_parent))
        problems.append(
            f"node {i + 1} parent {parents[i]} out of topological order")
    if not np.isfinite(weight).all():
        problems.append("non-finite weights")
    elif (weight < 0).any():
        problems.append(f"{int((weight < 0).sum())} negative weights")
    # parents must be internal nodes (parent node id p>0 -> record p-1)
    rec_parents = parents[parents > 0] - 1
    if len(rec_parents):
        leaf_parents = is_leaf[np.clip(rec_parents, 0, n - 1)]
        if leaf_parents.any():
            bad = parents[parents > 0][np.argmax(leaf_parents)]
            problems.append(f"a node's parent {bad} is a leaf")
    counts = np.bincount(np.clip(parents, 0, n), minlength=n + 1)
    if counts.max() > k:
        problems.append(
            f"a node has {int(counts.max())} children (> k={k})")
    n_words = int(is_leaf.sum())
    if n_words > k ** L:
        problems.append(f"{n_words} leaves > k^L = {k ** L}")
    if problems:
        raise ValueError(
            f"{path}: strict vocabulary parse failed — "
            + "; ".join(problems)
            + f" (header: n={n}, k={k}, L={L})"
        )


def save_orb_vocab_binary(path: str, parents: np.ndarray, desc: np.ndarray,
                          weights: np.ndarray, is_leaf: np.ndarray,
                          k: int = 10, L: int = 6) -> None:
    """Write the DBoW2 binary layout (testing/interop counterpart of
    load_orb_vocab_binary; the reference only ships the pre-built file)."""
    n = len(parents)
    size_node = 41
    header = np.array([n, size_node], np.uint32).tobytes()
    header += np.array([k, L, 0, 0], np.int32).tobytes()
    rec = np.zeros((n, size_node), np.uint8)
    rec[:, 0:4] = np.asarray(parents, np.int32)[:, None].view(np.uint8).reshape(n, 4)
    rec[:, 4:36] = np.asarray(desc, np.uint8).reshape(n, 32)
    rec[:, 36:40] = np.asarray(weights, np.float32)[:, None].view(np.uint8).reshape(n, 4)
    rec[:, 40] = np.asarray(is_leaf, bool).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(header + rec.tobytes())


def load_orb_vocab_text(path: str, as_tree: Optional[bool] = None):
    """Load a DBoW2 text-format vocabulary (ORBvoc.txt): header 'k L s1 s2'
    then one node per line: parent is_leaf 32-byte-descriptor weight.
    Small files keep only the leaves (flat MXU lookup); large ones keep the
    tree for staged descent (see load_vocab)."""
    with open(path) as f:
        header = f.readline().split()
        parents, descs, weights, leaf_flags = [], [], [], []
        for line in f:
            parts = line.split()
            if len(parts) < 35:
                continue
            parents.append(int(parts[0]))
            leaf_flags.append(parts[1] in ("1", "True"))
            descs.append(np.asarray([int(x) for x in parts[2:34]], np.uint8))
            weights.append(float(parts[34]))
    is_leaf = np.asarray(leaf_flags, bool)
    desc = np.stack(descs)
    w = np.asarray(weights, np.float32)
    n_words = int(is_leaf.sum())
    if as_tree or (as_tree is None and n_words > TREE_WORD_THRESHOLD):
        from pointslot_tpu.vocab.tree import TreeVocabulary

        k = int(header[0]) if len(header) >= 2 else 10
        L = int(header[1]) if len(header) >= 2 else 6
        return TreeVocabulary.from_parent_array(
            np.asarray(parents, np.int32), desc.view(np.uint32), w, is_leaf,
            k=max(k, 2), depth=max(L, 1) + 1,
        )
    return BinaryVocabulary(desc[is_leaf].view(np.uint32), w[is_leaf])
