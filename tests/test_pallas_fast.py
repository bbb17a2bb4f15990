"""Pallas FAST kernel vs the XLA-composed reference implementation
(interpret mode on CPU; the real lowering runs in the TPU bench)."""

import numpy as np
import jax.numpy as jnp

from trackingbench_slam_tpu.ops import fast as fast_ops
from trackingbench_slam_tpu.ops.pallas.fast_kernel import fast_score_map_pallas


def test_pallas_matches_reference(test_image):
    img = jnp.asarray(test_image)
    ref = np.asarray(fast_ops.nms3x3(fast_ops.fast_score_map(img, 20.0, 9)))
    ours = np.asarray(fast_score_map_pallas(img, 20.0, 9, interpret=True))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_pallas_arc10(test_image):
    img = jnp.asarray(test_image)
    ref = np.asarray(fast_ops.nms3x3(fast_ops.fast_score_map(img, 15.0, 10)))
    ours = np.asarray(fast_score_map_pallas(img, 15.0, 10, interpret=True))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_pallas_odd_shapes():
    r = np.random.RandomState(0)
    img = jnp.asarray(r.rand(123, 217).astype(np.float32) * 255)
    ref = np.asarray(fast_ops.nms3x3(fast_ops.fast_score_map(img, 25.0, 9)))
    ours = np.asarray(fast_score_map_pallas(img, 25.0, 9, interpret=True))
    np.testing.assert_allclose(ours, ref, atol=1e-4)
