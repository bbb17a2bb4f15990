"""Sparse BowVector + database: equivalence with the dense path on a small
vocabulary, and memory-bounded operation at ORBvoc scale (k=10, L=6 -> 10^6
words), where the dense (capacity, num_words) database is impossible
(VERDICT r3 missing #2)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from trackingbench_slam_tpu.bow import vocabulary as bow


def _random_descs(n, seed):
    r = np.random.RandomState(seed)
    return r.randint(0, 2 ** 32, size=(n, 8), dtype=np.uint32)


@pytest.fixture(scope="module")
def voc():
    return bow.train(_random_descs(2000, 0), branching=4, depth=3, seed=1)


def _vecs(voc, n_imgs, n_feat=64, seed=3):
    r = np.random.RandomState(seed)
    out = []
    for i in range(n_imgs):
        d = jnp.asarray(_random_descs(n_feat, seed + i))
        valid = jnp.asarray(r.rand(n_feat) > 0.1)
        words, _ = bow.transform(voc, d, valid)
        out.append((words, valid))
    return out

def test_sparse_matches_dense_vector(voc):
    for words, valid in _vecs(voc, 4):
        dense = np.asarray(bow.bow_vector(voc, words, valid))
        sp = bow.sparse_bow_vector(voc, words, valid)
        w = np.asarray(sp.words)
        wt = np.asarray(sp.weights)
        rebuilt = np.zeros_like(dense)
        live = w < voc.num_words
        rebuilt[w[live]] = wt[live]
        np.testing.assert_allclose(rebuilt, dense, atol=1e-6)
        # sorted with sentinel tail
        assert np.all(np.diff(w) >= 0)
        assert np.all(wt[~live] == 0)


def test_sparse_score_matches_dense(voc):
    vecs = _vecs(voc, 6)
    dense = [bow.bow_vector(voc, w, v) for w, v in vecs]
    sparse = [bow.sparse_bow_vector(voc, w, v) for w, v in vecs]
    for i in range(len(vecs)):
        for j in range(len(vecs)):
            sd = float(bow.score_l1(dense[i], dense[j]))
            ss = float(bow.score_l1_sparse(sparse[i], sparse[j].words,
                                           sparse[j].weights))
            assert abs(sd - ss) < 1e-5, (i, j, sd, ss)


def test_sparse_database_matches_dense(voc):
    vecs = _vecs(voc, 10)
    db_d = bow.BowDatabase(voc, capacity=16)
    db_s = bow.SparseBowDatabase(voc, width=64, capacity=16)
    for w, v in vecs:
        db_d.add(bow.bow_vector(voc, w, v))
        db_s.add(bow.sparse_bow_vector(voc, w, v))
    for w, v in vecs[:3]:
        qd = bow.bow_vector(voc, w, v)
        qs = bow.sparse_bow_vector(voc, w, v)
        id_d, sc_d = db_d.query(qd, top_k=4, exclude_recent=2)
        id_s, sc_s = db_s.query(qs, top_k=4, exclude_recent=2)
        np.testing.assert_array_equal(np.asarray(id_d), np.asarray(id_s))
        np.testing.assert_allclose(np.asarray(sc_d), np.asarray(sc_s),
                                   atol=1e-5)


def test_orbvoc_scale_text_load_and_sparse_query(tmp_path):
    """Synthetic INCOMPLETE k=10, L=6 text vocabulary (the ORBvoc.txt
    shape, TemplatedVocabulary.h:1338-1430): the text loader densifies it
    and the sparse retrieval layer operates without ever allocating a
    (capacity, 10^6) table."""
    r = np.random.RandomState(7)
    k, L = 10, 6
    path = os.path.join(tmp_path, "bigvoc.txt")
    # build a sparse tree: root has k children; only ~2 children per node
    # below that (DBoW2 trees are ragged; real ORBvoc is incomplete too)
    lines = []
    next_id = 1
    frontier = [0]
    for lvl in range(1, L + 1):
        new_frontier = []
        for parent in frontier:
            width = k if lvl == 1 else 2
            for _ in range(width):
                d = r.randint(0, 256, size=32)
                is_leaf = 1 if lvl == L else 0
                w = float(r.rand()) if is_leaf else 0.0
                lines.append(f"{parent} {is_leaf} "
                             + " ".join(str(int(x)) for x in d) + f" {w}")
                new_frontier.append(next_id)
                next_id += 1
        frontier = new_frontier
    with open(path, "w") as f:
        f.write(f"{k} {L} 0 0\n")
        f.write("\n".join(lines) + "\n")

    voc = bow.load_vocabulary_text(path, levels_up=2)
    assert voc.num_words == k ** L  # 10^6 words, dense-levels layout
    n_feat = 256
    db = bow.SparseBowDatabase(voc, width=n_feat, capacity=64)
    # database memory is capacity*width*(4+4) bytes ~ 128 kB, NOT 256 MB
    assert (db.words.size * 4 + db.weights.size * 4) < 10 ** 6

    descs = [jnp.asarray(_random_descs(n_feat, 100 + i)) for i in range(6)]
    valid = jnp.ones((n_feat,), bool)
    vecs = []
    for d in descs:
        words, _ = bow.transform(voc, d, valid)
        vecs.append(bow.sparse_bow_vector(voc, words, valid))
    for v in vecs:
        db.add(v)
    # self-query (excluding nothing) must return itself with the top score
    for i, v in enumerate(vecs):
        idx, sc = db.query(v, top_k=3)
        assert int(idx[0]) == i
        assert float(sc[0]) >= float(sc[1]) - 1e-6
        assert abs(float(sc[0]) - 1.0) < 1e-5  # L1 self-score = 1
