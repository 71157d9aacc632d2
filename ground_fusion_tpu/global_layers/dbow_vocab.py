"""DBoW2 binary-vocabulary import: load the reference's trained
``support_files/brief_k10L6.bin`` and run its tree quantization + TF-IDF L1
scoring as device math (VERDICT r4 missing #3 / next #6).

Why this exists: the shipped LSH quantizer (:mod:`.bow`) is a redesign whose
score populations — and therefore loop gates — differ from DBoW2's. For
parity runs on real data the operating point must be comparable to the
reference's (``pose_graph.cpp:476-480`` gates 0.05/0.015 against the trained
k=10/L=6 vocabulary), so this module loads that exact artifact.

Binary layout (VocabularyBinary.{hpp,cpp} — the VINS fork's own serializer):
``int32 k, L, scoringType, weightingType, nNodes, nWords`` then ``nNodes`` ×
``{int32 nodeId, int32 parentId, float64 weight, uint64 descriptor[4]}``
(48 bytes, no padding) then ``nWords`` × ``{int32 nodeId, int32 wordId}``.
Node ids are 1-based into a tree whose root is node 0 and is NOT serialized
(TemplatedVocabulary::loadBin).

Quantization (TemplatedVocabulary::transform): from the root, descend L
levels picking the child with minimum Hamming distance; the leaf's word id +
trained weight form the (word, tf·weight) BoW entry. Here the walk is
branch-free: a padded ``children[node, k]`` table + one batched
XOR-popcount per level, vmapped over all descriptors.

Scoring: DBoW2 ``L1Scoring`` over L1-normalized TF-IDF vectors reduces to
``s = Σ_{common words} min(q_w, d_w)``; with ~1e6 leaf words the vectors are
sparse, so keyframes store sorted (word, weight) arrays and the
query-vs-all-N score is a vmapped ``searchsorted`` intersection.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_HDR = np.dtype([("k", "<i4"), ("L", "<i4"), ("scoring", "<i4"),
                 ("weighting", "<i4"), ("n_nodes", "<i4"), ("n_words", "<i4")])
_NODE = np.dtype([("node_id", "<i4"), ("parent_id", "<i4"),
                  ("weight", "<f8"), ("desc", "<u8", (4,))])
_WORD = np.dtype([("node_id", "<i4"), ("word_id", "<i4")])


class DBoW2Vocabulary:
    """Parsed vocabulary tree with device tables for quantization."""

    def __init__(self, k: int, L: int, children: np.ndarray,
                 node_desc: np.ndarray, node_word: np.ndarray,
                 node_weight: np.ndarray, n_words: int):
        self.k = k
        self.L = L
        self.n_words = n_words
        # device tables (children padded with -1, masked by child_valid)
        self.children = jnp.asarray(children)              # [N, k] i32
        self.child_valid = jnp.asarray(children >= 0)
        self.desc_packed = jnp.asarray(node_desc)          # [N, 8] u32
        self.node_word = jnp.asarray(node_word)            # [N] i32 (-1 inner)
        self.node_weight = jnp.asarray(node_weight, jnp.float32)

    # -- io ----------------------------------------------------------------

    @classmethod
    def load_binary(cls, path: str) -> "DBoW2Vocabulary":
        with open(path, "rb") as fp:
            hdr = np.frombuffer(fp.read(_HDR.itemsize), _HDR)[0]
            nodes = np.frombuffer(fp.read(_NODE.itemsize * int(hdr["n_nodes"])),
                                  _NODE)
            words = np.frombuffer(fp.read(_WORD.itemsize * int(hdr["n_words"])),
                                  _WORD)
        n = int(nodes["node_id"].max()) + 1 if len(nodes) else 1
        k = int(hdr["k"])
        children = np.full((n, k), -1, np.int32)
        child_count = np.zeros(n, np.int32)
        node_desc = np.zeros((n, 8), np.uint32)
        node_weight = np.zeros(n, np.float64)
        for rec in nodes:
            nid, pid = int(rec["node_id"]), int(rec["parent_id"])
            children[pid, child_count[pid]] = nid
            child_count[pid] += 1
            node_desc[nid] = rec["desc"].view(np.uint32)
            node_weight[nid] = rec["weight"]
        node_word = np.full(n, -1, np.int32)
        node_word[words["node_id"]] = words["word_id"]
        return cls(k, int(hdr["L"]), children, node_desc, node_word,
                   node_weight, int(hdr["n_words"]))

    @staticmethod
    def save_binary(path: str, k: int, L: int, children: np.ndarray,
                    node_desc: np.ndarray, node_word: np.ndarray,
                    node_weight: np.ndarray) -> None:
        """Write the VINSLoop binary format (round-trip testing; also lets a
        user export a self-trained vocabulary for the reference stack)."""
        n = children.shape[0]
        recs, words = [], []
        for pid in range(n):
            for c in children[pid]:
                if c < 0:
                    continue
                recs.append((c, pid, float(node_weight[c]),
                             node_desc[c].view(np.uint64)))
                if node_word[c] >= 0:
                    words.append((c, int(node_word[c])))
        nodes = np.array(recs, _NODE)
        warr = np.array(words, _WORD)
        hdr = np.array([(k, L, 0, 0, len(nodes), len(warr))], _HDR)
        with open(path, "wb") as fp:
            fp.write(hdr.tobytes())
            fp.write(nodes.tobytes())
            fp.write(warr.tobytes())

    # -- quantization ------------------------------------------------------

    def quantize(self, desc_packed: jax.Array, ok: jax.Array):
        """Descriptors [K,8] u32 → (word ids [K] i32 (-1 invalid),
        weights [K] f32) via the L-level Hamming tree walk."""
        return _tree_quantize(self.children, self.child_valid,
                              self.desc_packed, self.node_word,
                              self.node_weight, desc_packed, ok, self.L)


@partial(jax.jit, static_argnames=("L",))
def _tree_quantize(children, child_valid, node_desc, node_word, node_weight,
                   desc, ok, L: int):
    def walk_one(d):
        cur = jnp.asarray(0, jnp.int32)
        for _ in range(L):
            cand = children[cur]                           # [k]
            valid = child_valid[cur]
            x = node_desc[jnp.maximum(cand, 0)] ^ d[None, :]
            dist = jnp.sum(
                jax.lax.population_count(x.astype(jnp.uint32)), axis=1)
            dist = jnp.where(valid, dist, jnp.iinfo(jnp.int32).max)
            nxt = cand[jnp.argmin(dist)]
            # ragged trees: stop at leaves (no valid children)
            cur = jnp.where(valid.any(), nxt, cur)
        return node_word[cur], node_weight[cur]

    wid, wt = jax.vmap(walk_one)(desc)
    return jnp.where(ok, wid, -1), jnp.where(ok, wt, 0.0)


@jax.jit
def sparse_l1_scores(db_words, db_w, db_valid, q_words, q_w):
    """DBoW2 L1 score of the query against every stored keyframe:
    ``s = Σ_{common} min(q, d)`` over L1-normalized TF-IDF vectors.
    ``db_words`` [N,K] sorted i32 (pad INT32_MAX), ``db_w`` [N,K] f32;
    ``q_words`` [K] sorted, ``q_w`` [K]."""
    def one(words, w):
        idx = jnp.searchsorted(words, q_words)
        idx = jnp.clip(idx, 0, words.shape[0] - 1)
        hit = words[idx] == q_words
        return jnp.sum(jnp.where(hit, jnp.minimum(w[idx], q_w), 0.0))

    s = jax.vmap(one)(db_words, db_w)
    return jnp.where(db_valid, s, 0.0)


def _bow_vector(word_ids: np.ndarray, weights: np.ndarray, pad_to: int):
    """(sorted unique words, tf·weight L1-normalized), padded."""
    ok = word_ids >= 0
    wid = word_ids[ok]
    wt = weights[ok]
    uniq, inv = np.unique(wid, return_inverse=True)
    acc = np.zeros(len(uniq))
    np.add.at(acc, inv, wt)                    # tf × trained idf weight
    norm = acc.sum()
    if norm > 0:
        acc = acc / norm
    out_w = np.full(pad_to, np.iinfo(np.int32).max, np.int32)
    out_v = np.zeros(pad_to, np.float32)
    m = min(len(uniq), pad_to)
    out_w[:m] = uniq[:m]
    out_v[:m] = acc[:m]
    return out_w, out_v


class SparseBowDatabase:
    """Keyframe database over DBoW2-quantized sparse BoW vectors — the same
    gate semantics as :class:`.bow.KeyframeDatabase` (top-4, best > 0.05,
    candidates > 0.015, 50-frame gap, earliest wins;
    pose_graph.cpp:432-512) at the reference's trained operating point."""

    def __init__(self, vocab: DBoW2Vocabulary, capacity: int = 512,
                 max_words_per_kf: int = 512, score_best: float = 0.05,
                 score_min: float = 0.015, min_gap: int = 50):
        self.vocab = vocab
        self.capacity = capacity
        self.K = max_words_per_kf
        self.score_best = score_best
        self.score_min = score_min
        self.min_gap = min_gap
        self.db_words = jnp.full((capacity, self.K),
                                 np.iinfo(np.int32).max, jnp.int32)
        self.db_w = jnp.zeros((capacity, self.K), jnp.float32)
        self.valid = jnp.zeros((capacity,), bool)
        self.kf_idx = np.full(capacity, -1, np.int64)
        self.count = 0

    def bow_vector(self, desc_packed, ok):
        wid, wt = self.vocab.quantize(jnp.asarray(desc_packed), jnp.asarray(ok))
        return _bow_vector(np.asarray(wid), np.asarray(wt), self.K)

    def _grow(self):
        self.db_words = jnp.concatenate(
            [self.db_words,
             jnp.full_like(self.db_words, np.iinfo(np.int32).max)])
        self.db_w = jnp.concatenate([self.db_w, jnp.zeros_like(self.db_w)])
        self.valid = jnp.concatenate(
            [self.valid, jnp.zeros((self.capacity,), bool)])
        self.kf_idx = np.concatenate(
            [self.kf_idx, np.full(self.capacity, -1, np.int64)])
        self.capacity *= 2

    def add(self, vec, kf_index: int | None = None) -> int:
        words, w = vec
        if self.count == self.capacity:
            self._grow()
        i = self.count
        self.db_words = self.db_words.at[i].set(jnp.asarray(words))
        self.db_w = self.db_w.at[i].set(jnp.asarray(w))
        self.valid = self.valid.at[i].set(True)
        self.kf_idx[i] = self.count if kf_index is None else int(kf_index)
        self.count += 1
        return i

    def query(self, vec, cur_index: int) -> int:
        if self.count == 0:
            return -1
        words, w = vec
        scores = np.asarray(sparse_l1_scores(
            self.db_words, self.db_w, self.valid,
            jnp.asarray(words), jnp.asarray(w)))
        recent = self.kf_idx > cur_index - self.min_gap
        scores_g = np.where(recent, 0.0, scores)
        top4 = np.argsort(-scores_g)[:4]
        if scores_g[top4[0]] <= self.score_best:
            return -1
        cands = [int(self.kf_idx[i]) for i in top4
                 if scores_g[i] > self.score_min]
        return min(cands) if cands else -1
