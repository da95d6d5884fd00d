"""Hierarchical binary vocabulary + sparse BoW database at ORBvoc scale.

The reference descends a k^L tree of binary centroids (Thirdparty/DBoW2/
DBoW2/TemplatedVocabulary.h:1343 — ORBvoc is k=10, L=6, ~1M leaves) and
scores keyframes through an inverted index (src/KeyFrameDatabase.cc).
The flat argmin lookup in vocab/bow.py is the right call at the 512-word
self-trained scale, but at 10^5-10^6 words a (N_feat, W) distance table and
a dense (K, W) database matrix are off the table.

TPU-native design:
  - transform = L fixed descent stages under jit: gather each feature's
    current node's k children descriptors -> one XOR+popcount reduction ->
    argmin. Work is O(N * k * L) instead of O(N * W); every stage is a
    static-shape gather + elementwise reduce.
  - the database is sparse: per-keyframe (word_ids, tf-idf weights) arrays
    plus an inverted index word -> {kf: weight}. For L1-normalized
    non-negative vectors the DBoW2 L1 score 1 - 0.5*sum|a - b| equals
    sum_{common words} min(a_i, b_i), so a whole-database query walks only
    the posting lists of the query's words — exactly the reference's
    inverted-index traversal (src/KeyFrameDatabase.cc:DetectLoopCandidates).

Memory: O(total_nodes * 40 B) for the tree, O(K * words_per_kf) for the
database — no (K, W) matrix at any scale.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BIG = np.int32(1 << 20)


def _popcount_bytes(x: np.ndarray) -> np.ndarray:
    return np.unpackbits(x.view(np.uint8), axis=-1).sum(-1)


class TreeVocabulary:
    """k-ary binary vocabulary tree with jitted staged descent."""

    def __init__(self, node_desc: np.ndarray, children: np.ndarray,
                 weights: np.ndarray, is_leaf: np.ndarray,
                 k: int, depth: int):
        self.node_desc = np.asarray(node_desc, np.uint32)    # (T, 8)
        self.children = np.asarray(children, np.int32)       # (T, k) -1 pad
        self.node_weights = np.asarray(weights, np.float32)  # (T,)
        self.is_leaf = np.asarray(is_leaf, bool)             # (T,)
        self.k = int(k)
        self.depth = int(depth)
        # word id = rank of the leaf among leaves (node-array order), the
        # same convention DBoW2 uses when it assigns word ids at load
        leaf_word = np.full(len(self.node_desc), -1, np.int32)
        leaf_idx = np.nonzero(self.is_leaf)[0]
        leaf_word[leaf_idx] = np.arange(len(leaf_idx), dtype=np.int32)
        self.leaf_word = leaf_word
        self.n_words = int(len(leaf_idx))
        self.word_weights = self.node_weights[leaf_idx].astype(np.float32)

        self._desc_j = jnp.asarray(self.node_desc)
        self._children_j = jnp.asarray(self.children)
        self._leaf_word_j = jnp.asarray(self.leaf_word)
        self._word_w_j = jnp.asarray(self.word_weights)
        self._transform = jax.jit(self._transform_impl)

    # ------------------------------------------------------------------
    def _transform_impl(self, desc: jnp.ndarray, valid: jnp.ndarray):
        """Staged tree descent: L gather+popcount+argmin stages, O(N*k*L).

        Returns (word_ids (N,) int32 with -1 for invalid features,
        tf-idf weights (N,) f32 per feature before aggregation)."""
        n = desc.shape[0]
        cur = jnp.zeros((n,), jnp.int32)  # root = node 0
        for _ in range(self.depth):
            ch = self._children_j[cur]                        # (N, k)
            ch_desc = self._desc_j[jnp.maximum(ch, 0)]        # (N, k, 8)
            x = jnp.bitwise_xor(ch_desc, desc[:, None, :])
            d = jnp.sum(jax.lax.population_count(x), axis=-1) # (N, k)
            d = jnp.where(ch >= 0, d.astype(jnp.int32), BIG)
            best = jnp.argmin(d, axis=1)
            nxt = jnp.take_along_axis(ch, best[:, None], axis=1)[:, 0]
            cur = jnp.where(nxt >= 0, nxt, cur)  # leaves stay put
        word = self._leaf_word_j[cur]
        word = jnp.where(valid, word, -1)
        w = jnp.where(word >= 0, self._word_w_j[jnp.maximum(word, 0)], 0.0)
        return word.astype(jnp.int32), w

    # ------------------------------------------------------------------
    def bow_vector(self, desc, valid) -> Tuple[np.ndarray, np.ndarray]:
        """(unique word ids (M,), L1-normalized tf-idf weights (M,))."""
        word, w = self._transform(jnp.asarray(desc), jnp.asarray(valid))
        word = np.asarray(word)
        w = np.asarray(w)
        keep = word >= 0
        if not keep.any():
            return np.zeros(0, np.int32), np.zeros(0, np.float32)
        uw, inv = np.unique(word[keep], return_inverse=True)
        acc = np.zeros(len(uw), np.float64)
        np.add.at(acc, inv, w[keep])
        total = acc.sum()
        if total <= 0:
            # zero-idf vocabulary: fall back to term counts
            np.add.at(acc, inv, 1.0)
            total = acc.sum()
        return uw.astype(np.int32), (acc / max(total, 1e-9)).astype(np.float32)

    def word_ids(self, desc, valid) -> np.ndarray:
        """(N,) word id per feature (-1 invalid) — the direct-index analog
        used for BoW-gated feature matching."""
        word, _ = self._transform(jnp.asarray(desc), jnp.asarray(valid))
        return np.asarray(word)

    # ------------------------------------------------------------------
    @classmethod
    def train(cls, descriptors: np.ndarray, k: int = 10, depth: int = 3,
              seed: int = 0, kmeans_iters: int = 6) -> "TreeVocabulary":
        """Hierarchical binary k-means (majority-vote centroids), the same
        construction DBoW2 uses offline. Builds up to k^depth leaves."""
        from pointslot_tpu.vocab.bow import _pack_bits, _unpack_bits

        rng = np.random.default_rng(seed)
        desc = np.unique(np.asarray(descriptors, np.uint32), axis=0)
        bits_all = _unpack_bits(desc)

        node_desc: List[np.ndarray] = [np.zeros(8, np.uint32)]  # root
        children: List[List[int]] = [[]]
        parents: List[int] = [-1]
        levels: List[int] = [0]

        def split(node: int, idx: np.ndarray, level: int):
            if level >= depth or len(idx) <= 1:
                return
            kk = min(k, len(idx))
            cent = desc[rng.choice(idx, kk, replace=False)]
            for _ in range(kmeans_iters):
                x = desc[idx, None, :] ^ cent[None, :, :]
                d = _popcount_bytes(x)
                assign = d.argmin(1)
                new = cent.copy()
                for c in range(kk):
                    m = bits_all[idx[assign == c]]
                    if len(m):
                        new[c] = _pack_bits(
                            (m.mean(0) > 0.5)[None].astype(np.uint8))[0]
                if np.array_equal(new, cent):
                    break
                cent = new
            x = desc[idx, None, :] ^ cent[None, :, :]
            d = _popcount_bytes(x)
            assign = d.argmin(1)
            for c in range(kk):
                sub = idx[assign == c]
                if len(sub) == 0:
                    continue
                node_desc.append(cent[c])
                children.append([])
                parents.append(node)
                levels.append(level + 1)
                cid = len(node_desc) - 1
                children[node].append(cid)
                split(cid, sub, level + 1)

        split(0, np.arange(len(desc)), 0)

        T = len(node_desc)
        ch = np.full((T, k), -1, np.int32)
        for i, cs in enumerate(children):
            ch[i, : len(cs)] = cs
        is_leaf = np.array([len(cs) == 0 for cs in children], bool)
        is_leaf[0] = False
        # idf weights over the training set
        vocab = cls(np.stack(node_desc), ch, np.ones(T, np.float32),
                    is_leaf, k, depth)
        word, _ = vocab._transform(
            jnp.asarray(desc), jnp.ones(len(desc), bool))
        counts = np.bincount(np.asarray(word)[np.asarray(word) >= 0],
                             minlength=vocab.n_words).astype(np.float64)
        idf = np.log(len(desc) / np.maximum(counts, 1.0)).astype(np.float32)
        w = np.zeros(T, np.float32)
        w[vocab.leaf_word >= 0] = idf[vocab.leaf_word[vocab.leaf_word >= 0]]
        return cls(np.stack(node_desc), ch, w, is_leaf, k, depth)

    # ------------------------------------------------------------------
    def save_binary(self, path: str) -> None:
        """Write the DBoW2 binary layout (records are nodes 1.., parent
        field is a node id) — round-trips through load_orb_vocab_binary."""
        from pointslot_tpu.vocab.bow import save_orb_vocab_binary

        T = len(self.node_desc)
        parents = np.zeros(T, np.int32)
        idx = np.repeat(np.arange(T, dtype=np.int32), self.children.shape[1])
        ch = self.children.ravel()
        m = ch >= 0
        parents[ch[m]] = idx[m]
        save_orb_vocab_binary(
            path, parents[1:], self.node_desc[1:].view(np.uint8),
            self.node_weights[1:], self.is_leaf[1:],
            k=self.k, L=self.depth,
        )

    # ------------------------------------------------------------------
    @classmethod
    def from_parent_array(cls, parents: np.ndarray, desc: np.ndarray,
                          weights: np.ndarray, is_leaf: np.ndarray,
                          k: int, depth: int) -> "TreeVocabulary":
        """Build from the (parent-pointer) node records of the DBoW2
        binary/text formats (the layout the reference loads at
        src/System.cc:79 via TemplatedVocabulary::loadFromBinaryFile,
        Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:1343): records are
        nodes 1..N in file order, the implicit root is node 0, and each
        record's parent field is a node id (0 = child of root)."""
        parents = np.asarray(parents, np.int64)
        T = len(parents) + 1  # records exclude the root
        node_desc = np.zeros((T, 8), np.uint32)
        node_desc[1:] = np.asarray(desc, np.uint32).reshape(-1, 8)
        w = np.zeros(T, np.float32)
        w[1:] = weights
        leaf = np.zeros(T, bool)
        leaf[1:] = is_leaf
        counts = np.bincount(parents, minlength=T)
        kk = max(int(counts.max(initial=1)), 1)
        children = np.full((T, kk), -1, np.int32)
        # vectorized child-slot assignment (a Python loop here is minutes
        # at the 1M-node ORBvoc scale): stable-sort records by parent,
        # then each record's slot is its rank within its parent group
        order = np.argsort(parents, kind="stable")
        sp = parents[order]
        rank = np.arange(len(sp)) - np.searchsorted(sp, sp, side="left")
        children[sp, rank] = (order + 1).astype(np.int32)
        return cls(node_desc, children, w, leaf, kk, depth)

    @classmethod
    def synthesize(cls, k: int = 10, depth: int = 6,
                   seed: int = 0) -> "TreeVocabulary":
        """Random perfect k^depth tree at the ORBvoc operating point
        (k=10, L=6, ~1M leaves — the scale the reference loads at startup,
        src/System.cc:79 / TemplatedVocabulary.h:1343). The real
        ORBvoc.bin is not fetchable in this environment; a synthesized
        tree validates memory, descent latency, compile behavior and the
        sparse database at the reference's scale. Breadth-first layout:
        level l occupies nodes [(k^l-1)/(k-1), (k^{l+1}-1)/(k-1))."""
        rng = np.random.default_rng(seed)
        level_sizes = [k**l for l in range(depth + 1)]
        T = sum(level_sizes)
        node_desc = rng.integers(0, 2**32, (T, 8), dtype=np.uint32)
        node_desc[0] = 0
        children = np.full((T, k), -1, np.int32)
        off = 0
        for l in range(depth):
            n_l = level_sizes[l]
            base = off + n_l + np.arange(n_l, dtype=np.int64) * k
            children[off : off + n_l] = (
                base[:, None] + np.arange(k)
            ).astype(np.int32)
            off += n_l
        is_leaf = np.zeros(T, bool)
        is_leaf[T - level_sizes[depth] :] = True
        weights = np.zeros(T, np.float32)
        weights[is_leaf] = rng.uniform(0.2, 1.0, level_sizes[depth])
        return cls(node_desc, children, weights, is_leaf, k, depth)


class SparseKeyFrameDatabase:
    """Inverted-index BoW database (reference src/KeyFrameDatabase.cc),
    memory O(K * words-per-KF) — scales to ORBvoc-size vocabularies."""

    def __init__(self, vocab: TreeVocabulary, max_kfs: int):
        self.vocab = vocab
        self._kf: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        self._inv: Dict[int, Dict[int, float]] = {}
        self.max_kfs = max_kfs

    def transform(self, desc: np.ndarray, valid: np.ndarray):
        return self.vocab.bow_vector(desc, valid)

    def clear(self):
        self._kf.clear()
        self._inv.clear()

    def add(self, kf: int, desc: np.ndarray, valid: np.ndarray):
        if kf in self._kf:
            self.remove(kf)
        words, weights = self.vocab.bow_vector(desc, valid)
        self._kf[kf] = (words, weights)
        for w, wt in zip(words.tolist(), weights.tolist()):
            self._inv.setdefault(w, {})[kf] = wt
        return (words, weights)

    def remove(self, kf: int):
        entry = self._kf.pop(kf, None)
        if entry is None:
            return
        for w in entry[0].tolist():
            post = self._inv.get(w)
            if post is not None:
                post.pop(kf, None)
                if not post:
                    del self._inv[w]

    def pair_score(self, kf: int, vec) -> float:
        """DBoW2 L1 similarity of a stored keyframe against a query vector
        (for L1-normalized non-negative vectors: sum of min over common
        words)."""
        entry = self._kf.get(kf)
        if entry is None:
            return -1.0
        qw, qv = vec
        kw, kv = entry
        common, qi, ki = np.intersect1d(qw, kw, return_indices=True)
        if len(common) == 0:
            return 0.0
        return float(np.minimum(qv[qi], kv[ki]).sum())

    def query(self, vec, exclude: Set[int], min_score: float) -> List[int]:
        qw, qv = vec
        scores: Dict[int, float] = {}
        for w, wt in zip(qw.tolist(), qv.tolist()):
            for kf, kwt in self._inv.get(w, {}).items():
                scores[kf] = scores.get(kf, 0.0) + min(wt, kwt)
        ids = [k for k, s in scores.items()
               if s >= min_score and k not in exclude]
        return sorted(ids, key=lambda k: -scores[k])
