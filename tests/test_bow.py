"""Vocabulary / BoW tests: cluster recovery, retrieval ranking, node-bucketed
matching through matchers.search_by_bow."""

import numpy as np
import jax.numpy as jnp

from trackingbench_slam_tpu.bow import vocabulary as bow
from trackingbench_slam_tpu.matchers import matcher as M


def _clustered_descs(rng, n_clusters=40, per_cluster=30, flip_bits=12):
    """Descriptors in tight Hamming clusters."""
    centers = rng.randint(0, 2 ** 32, size=(n_clusters, 8),
                          dtype=np.uint64).astype(np.uint32)
    out = []
    labels = []
    for c in range(n_clusters):
        for _ in range(per_cluster):
            d = centers[c].copy()
            for _ in range(flip_bits):
                w = rng.randint(8)
                b = rng.randint(32)
                d[w] ^= np.uint32(1 << b)
            out.append(d)
            labels.append(c)
    return np.stack(out), np.asarray(labels), centers


def test_transform_groups_cluster_members(rng):
    descs, labels, centers = _clustered_descs(rng)
    voc = bow.train(descs, branching=6, depth=3, kmedians_iters=6, seed=1)
    words, nodes = bow.transform(voc, jnp.asarray(descs),
                                 jnp.ones((descs.shape[0],), bool))
    words = np.asarray(words)
    # members of the same tight cluster should overwhelmingly share a word
    agree = 0
    for c in range(labels.max() + 1):
        w = words[labels == c]
        agree += (w == np.bincount(w).argmax()).mean()
    agree /= labels.max() + 1
    # hierarchical quantization splits some clusters at node boundaries;
    # ~0.8 same-word agreement is the expected regime for k=6, L=3
    assert agree > 0.7, agree


def test_bow_vector_normalized(rng):
    descs, _, _ = _clustered_descs(rng, n_clusters=10, per_cluster=20)
    voc = bow.train(descs, branching=4, depth=3, seed=2)
    words, _ = bow.transform(voc, jnp.asarray(descs[:100]),
                             jnp.ones((100,), bool))
    v = bow.bow_vector(voc, words, jnp.ones((100,), bool))
    assert abs(float(jnp.sum(jnp.abs(v))) - 1.0) < 1e-5
    assert float(bow.score_l1(v, v)) > 0.999


def test_retrieval_ranks_similar_image_first(rng):
    descs, labels, _ = _clustered_descs(rng, n_clusters=60, per_cluster=20)
    voc = bow.train(descs, branching=8, depth=3, seed=3)
    # three "images": A and A' share clusters; B uses different ones
    def img_words(cl):
        sel = np.isin(labels, cl)
        w, _ = bow.transform(voc, jnp.asarray(descs[sel]),
                             jnp.ones((int(sel.sum()),), bool))
        return bow.bow_vector(voc, w, jnp.ones((int(sel.sum()),), bool))
    vA = img_words(list(range(0, 20)))
    vA2 = img_words(list(range(0, 18)) + [25, 26])  # mostly same content
    vB = img_words(list(range(30, 50)))
    sAA = float(bow.score_l1(vA, vA2))
    sAB = float(bow.score_l1(vA, vB))
    assert sAA > sAB + 0.2, (sAA, sAB)
    # database query
    db = bow.BowDatabase(voc, capacity=8)
    db.add(vB)
    db.add(vA2)
    db.add(vB * 0.5)  # junk
    idx, scores = db.query(vA, top_k=2)
    assert int(np.asarray(idx)[0]) == 1


def test_search_by_bow_buckets(rng):
    """Node ids restrict matching: a copied descriptor set matches itself
    through bow-bucketed search."""
    descs, labels, _ = _clustered_descs(rng, n_clusters=30, per_cluster=10)
    voc = bow.train(descs, branching=6, depth=3, seed=4)
    n = 128
    d2 = descs[:n]
    perm = rng.permutation(n)
    d1 = d2[perm]
    valid = jnp.ones((n,), bool)
    w1, n1 = bow.transform(voc, jnp.asarray(d1), valid)
    w2, n2 = bow.transform(voc, jnp.asarray(d2), valid)
    res = M.search_by_bow(jnp.asarray(d1), valid, n1,
                          jnp.zeros((n,), jnp.float32),
                          jnp.asarray(d2), valid, n2,
                          jnp.zeros((n,), jnp.float32))
    ok = np.asarray(res.ok)
    idx = np.asarray(res.idx)
    assert ok.mean() > 0.9
    assert (idx[ok] == perm[ok]).all()


def test_kl_and_other_scores(rng):
    descs, _, _ = _clustered_descs(rng, n_clusters=10, per_cluster=20)
    voc = bow.train(descs, branching=4, depth=3, seed=5)
    w, _ = bow.transform(voc, jnp.asarray(descs[:50]), jnp.ones((50,), bool))
    v1 = bow.bow_vector(voc, w, jnp.ones((50,), bool))
    w2, _ = bow.transform(voc, jnp.asarray(descs[100:150]),
                          jnp.ones((50,), bool))
    v2 = bow.bow_vector(voc, w2, jnp.ones((50,), bool))
    assert float(bow.score_l2(v1, v1)) > float(bow.score_l2(v1, v2))
    assert float(bow.score_dot(v1, v1)) > float(bow.score_dot(v1, v2))
    assert float(bow.score_bhattacharyya(v1, v1)) > \
        float(bow.score_bhattacharyya(v1, v2))
    assert float(bow.score_chi_square(v1, v1)) > \
        float(bow.score_chi_square(v1, v2))
    assert float(bow.score_kl(v1, v1)) < float(bow.score_kl(v1, v2))


def test_text_format_roundtrip(rng, tmp_path):
    """DBoW2 ORBvoc.txt-format save/load preserves descent and weights
    (TemplatedVocabulary::saveToTextFile/loadFromTextFile)."""
    descs, _, _ = _clustered_descs(rng, n_clusters=8, per_cluster=16)
    voc = bow.train(descs, branching=3, depth=3, seed=2)
    p = str(tmp_path / "voc.txt")
    bow.save_vocabulary_text(voc, p)
    voc2 = bow.load_vocabulary_text(p, levels_up=voc.levels_up)
    assert voc2.branching == voc.branching and voc2.depth == voc.depth
    q = jnp.asarray(descs[:64])
    v = jnp.ones((64,), bool)
    w1, n1 = bow.transform(voc, q, v)
    w2, n2 = bow.transform(voc2, q, v)
    assert (np.asarray(w1) == np.asarray(w2)).all()
    assert (np.asarray(n1) == np.asarray(n2)).all()
    ww1 = np.asarray(voc.word_weights)[np.asarray(w1)]
    ww2 = np.asarray(voc2.word_weights)[np.asarray(w2)]
    assert np.allclose(ww1, ww2, atol=1e-4)


def test_text_format_incomplete_tree(tmp_path):
    """An ORBvoc-style tree with missing children and an early leaf loads,
    and descent lands on real nodes (ties resolve to the first sibling)."""
    # root(0) -> nodes 1,2 (k=2, L=2). Node 1 has children 3,4; node 2 is
    # an early leaf (no children).
    def d(b):
        return " ".join([str(b)] * 32)
    lines = [
        "2 2 0 0",
        f"0 0 {d(0)} 0",    # node 1, internal
        f"0 1 {d(255)} 0.5",  # node 2, early leaf
        f"1 1 {d(1)} 0.25",   # node 3, leaf
        f"1 1 {d(3)} 0.75",   # node 4, leaf
    ]
    p = tmp_path / "tiny.txt"
    p.write_text("\n".join(lines) + "\n")
    voc = bow.load_vocabulary_text(str(p), levels_up=1)
    assert voc.branching == 2 and voc.depth == 2
    # query near node 3's descriptor -> word slot 0 (path 1->3)
    q = np.zeros((2, 8), np.uint32)
    q[0].fill(0x01010101)  # bytes == 1 -> closest to node 3
    q[1].fill(0xFFFFFFFF)  # bytes == 255 -> early leaf, propagated down
    w, _ = bow.transform(voc, jnp.asarray(q), jnp.ones((2,), bool))
    w = np.asarray(w)
    ww = np.asarray(voc.word_weights)
    assert abs(ww[w[0]] - 0.25) < 1e-6
    assert abs(ww[w[1]] - 0.5) < 1e-6
