"""FAST detector tests against the OpenCV oracle (the very function the
reference calls at ORBextractor.cpp:785-804)."""

import numpy as np
import cv2
import jax.numpy as jnp

from trackingbench_slam_tpu.ops import fast as fast_ops


def test_fast9_corner_set_matches_cv2(test_image):
    img = test_image.astype(np.uint8)
    th = 20
    det = cv2.FastFeatureDetector_create(
        threshold=th, nonmaxSuppression=False,
        type=cv2.FastFeatureDetector_TYPE_9_16)
    kps = det.detect(img)
    cv_set = {(int(k.pt[0]), int(k.pt[1])) for k in kps
              if 3 <= k.pt[0] < img.shape[1] - 3 and 3 <= k.pt[1] < img.shape[0] - 3}
    score = np.asarray(fast_ops.fast_score_map(jnp.asarray(img, jnp.float32),
                                               float(th), arc=9))
    ours = {(x, y) for y, x in zip(*np.nonzero(score > 0))}
    # cv2's border handling keeps a couple more rows; compare interior
    assert len(cv_set) > 50
    missing = cv_set - ours
    extra = ours - cv_set
    assert len(missing) / max(len(cv_set), 1) < 0.01, f"missing {len(missing)} of {len(cv_set)}"
    assert len(extra) / max(len(ours), 1) < 0.01, f"extra {len(extra)} of {len(ours)}"


def test_nms_keeps_local_maxima():
    s = np.zeros((32, 32), np.float32)
    s[10, 10] = 5.0
    s[10, 11] = 3.0   # neighbor, weaker -> suppressed
    s[20, 20] = 2.0
    out = np.asarray(fast_ops.nms3x3(jnp.asarray(s)))
    assert out[10, 10] == 5.0
    assert out[10, 11] == 0.0
    assert out[20, 20] == 2.0


def test_nms_breaks_ties():
    s = np.zeros((16, 16), np.float32)
    s[5, 5] = 4.0
    s[5, 6] = 4.0  # tie: exactly one survives
    out = np.asarray(fast_ops.nms3x3(jnp.asarray(s)))
    assert (out > 0).sum() == 1


def test_shi_tomasi_corner_vs_edge(test_image):
    st = np.asarray(fast_ops.shi_tomasi_map(jnp.asarray(test_image)))
    # corners of pasted rectangles should outscore flat background
    assert st.max() > 10 * np.median(st)


def test_shi_tomasi_matches_cv2(test_image):
    img = test_image.astype(np.float32)
    ours = np.asarray(fast_ops.shi_tomasi_map(jnp.asarray(img), half=4))
    ref = cv2.cornerMinEigenVal(img, blockSize=8, ksize=1)
    # cv2 scales gradients differently (no 0.5 factor on central diff is
    # Sobel ksize=1 => [-1 0 1]); our grads are half theirs -> scores 1/4
    h, w = img.shape
    a = ours[8:h - 8, 8:w - 8] * 4.0
    b = ref[8:h - 8, 8:w - 8]
    # even-window anchor differs by half a pixel between the two
    # implementations, so expect rank-level agreement, not equality
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.85, corr


def test_grid_topk_budget_and_uniformity():
    r = np.random.RandomState(3)
    score = r.rand(120, 160).astype(np.float32)
    score[score < 0.9] = 0.0
    xy, resp, valid = fast_ops.grid_topk(jnp.asarray(score), cell=16,
                                         per_cell=2, budget=100)
    xy, resp, valid = map(np.asarray, (xy, resp, valid))
    assert xy.shape == (100, 2)
    n = valid.sum()
    assert n > 50
    # every reported point has its score
    for i in range(int(n)):
        x, y = int(xy[i, 0]), int(xy[i, 1])
        assert score[y, x] == resp[i]
    # per-cell cap respected
    cells = {}
    for i in range(int(n)):
        c = (int(xy[i, 0]) // 16, int(xy[i, 1]) // 16)
        cells[c] = cells.get(c, 0) + 1
    assert max(cells.values()) <= 2


def test_grid_topk_empty():
    score = jnp.zeros((64, 64), jnp.float32)
    xy, resp, valid = fast_ops.grid_topk(score, cell=16, per_cell=2, budget=10)
    assert not np.asarray(valid).any()


def test_grid_topk_two_threshold_gating():
    """Two-threshold fallback semantics (ORBextractor.cpp:765-804): a cell
    with a strong corner drops its weak corners; a cell with only weak
    corners keeps them."""
    import numpy as np
    import jax.numpy as jnp
    from trackingbench_slam_tpu.ops import fast as fast_ops

    score = np.zeros((16, 32), np.float32)
    strong = np.zeros((16, 32), bool)
    # cell (0, 0) [16x16]: one strong corner + one weak corner
    score[4, 4] = 100.0
    strong[4, 4] = True
    score[10, 10] = 50.0           # weak: must be gated out
    # cell (0, 1): only weak corners
    score[4, 20] = 30.0            # weak: must survive
    score[12, 28] = 20.0           # weak: must survive
    xy, resp, valid = fast_ops.grid_topk(
        jnp.asarray(score), cell=16, per_cell=4, budget=8,
        strong=jnp.asarray(strong))
    got = {(int(x), int(y)) for (x, y), v in
           zip(np.asarray(xy), np.asarray(valid)) if v}
    assert (4, 4) in got
    assert (10, 10) not in got     # gated by the strong corner in its cell
    assert (20, 4) in got
    assert (28, 12) in got
    # without the strong mask the weak corner survives
    xy2, _, valid2 = fast_ops.grid_topk(jnp.asarray(score), cell=16,
                                        per_cell=4, budget=8)
    got2 = {(int(x), int(y)) for (x, y), v in
            zip(np.asarray(xy2), np.asarray(valid2)) if v}
    assert (10, 10) in got2
