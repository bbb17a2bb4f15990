"""Learned rBRIEF pattern (VERDICT missing #6): the greedy-decorrelation
pattern must exist, be well-formed, and measurably beat the Gaussian
fallback on held-out oriented patches (lower inter-bit correlation, means
closer to 0.5 — the properties that improve match discrimination)."""

import numpy as np
import pytest


def test_learned_pattern_wellformed():
    from trackingbench_slam_tpu.ops.orb_pattern_learned import LEARNED_PAIRS
    from trackingbench_slam_tpu.ops.orb import brief_pattern

    p = np.asarray(LEARNED_PAIRS)
    assert p.shape == (256, 2, 2)
    assert np.abs(p).max() <= 13
    # no bit compares a point with itself, no duplicate tests
    assert not np.any(np.all(p[:, 0] == p[:, 1], axis=1))
    keys = {tuple(q.ravel()) for q in p}
    assert len(keys) == 256
    # and the production pattern IS the learned one
    assert np.array_equal(np.asarray(brief_pattern()), p)


@pytest.mark.slow
def test_learned_pattern_beats_gaussian_on_held_out():
    """On a held-out patch corpus (different scene seeds than training),
    the learned pattern's bits must be less correlated and closer to
    mean 0.5 than the Gaussian fallback's."""
    import sys, os
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools"))
    import train_orb_pattern as T
    from trackingbench_slam_tpu.ops import orb as orb_ops

    # held-out corpus: seeds disjoint from the trainer's defaults
    import trackingbench_slam_tpu.utils.synthetic as syn
    patches, angles = T.gather_patches(max_patches=4000, seed=99)

    def quality(pairs):
        bits = T.candidate_bits(patches, angles, pairs)
        mean = bits.mean(axis=0)
        c = np.corrcoef(bits.T)
        c = np.nan_to_num(c)
        off = np.abs(c - np.eye(len(pairs)))
        return off.mean(), np.abs(mean - 0.5).mean()

    from trackingbench_slam_tpu.ops.orb_pattern_learned import LEARNED_PAIRS
    # the Gaussian fallback, regenerated directly (brief_pattern() would
    # return the learned table)
    rng = np.random.RandomState(orb_ops._PATTERN_SEED)
    sigma = orb_ops.PATCH_SIZE / 5.0
    pts = []
    while len(pts) < orb_ops.NUM_BITS:
        p = np.clip(np.round(rng.randn(2, 2) * sigma), -13, 13).astype(int)
        if np.all(p[0] == p[1]):
            continue
        pts.append(p)
    gauss = np.asarray(pts, np.int32)

    corr_l, bias_l = quality(np.asarray(LEARNED_PAIRS))
    corr_g, bias_g = quality(gauss)
    assert corr_l < corr_g * 0.8, (corr_l, corr_g)
    assert bias_l < bias_g, (bias_l, bias_g)
