from trackingbench_slam_tpu.geometry import se3, camera, triangulation  # noqa: F401
