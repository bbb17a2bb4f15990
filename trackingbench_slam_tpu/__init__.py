"""trackingbench_slam_tpu — a TPU-native visual SLAM front-end workbench.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
linyicheng1/trackingBench-SLAM (reference: visual feature tracking benchmarks
for SLAM front-ends — ORB/FAST extraction, seven interchangeable matching
strategies, stereo depth, motion-only and windowed bundle adjustment, BoW
place recognition).

Design principles (TPU-first, not a port):
  * struct-of-arrays with static shapes + validity masks everywhere
  * batched/vmapped pure functions instead of per-feature objects
  * Pallas kernels for per-pixel hot loops (FAST, NMS, patch alignment)
  * Hamming matching on the MXU via ±1-bit matmul
  * Gauss-Newton / LM solvers with Huber IRLS + Schur complement instead of
    g2o+Cholmod
  * sharding via jax.sharding.Mesh + shard_map with psum over ICI
"""

__version__ = "0.1.0"

from trackingbench_slam_tpu.utils.config import (  # noqa: F401
    CameraConfig,
    ExtractorConfig,
    MatcherConfig,
    PipelineConfig,
    SolverConfig,
)
