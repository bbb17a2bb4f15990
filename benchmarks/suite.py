"""Benchmark suite: the five BASELINE.json configurations, one JSON line per
config (bench.py remains the single-headline-number entry point).

    python benchmarks/suite.py [--cpu] [--quick]

1. two-frame stereo VO (CPU-runnable smoke)
2. monocular frame-to-frame brute-force Hamming tracking
3. local BA window (10 keyframes, ~2k landmarks) — iterations/s
4. BoW place recognition: transform + database query throughput
5. distributed BA over an N-device mesh (scaling efficiency vs 1 device)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fence(x):
    import jax
    import jax.numpy as jnp
    leaves = jax.tree_util.tree_leaves(x)
    for l in leaves:
        if hasattr(l, "size") and l.size:
            jnp.asarray(l).ravel()[0].item()
            break


def bench_fn(fn, *args, reps=3, **kw):
    out = fn(*args, **kw)
    fence(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args, **kw)
        fence(out)
        ts.append(time.time() - t0)
    return min(ts)


def config1_two_frame(quick):
    import jax.numpy as jnp
    import numpy as np
    from trackingbench_slam_tpu.models.vo import StereoVO
    from trackingbench_slam_tpu.utils.synthetic import (PlaneSequence,
                                                        lateral_trajectory)
    from tests_shim import small_config
    cfg = small_config()
    seq = PlaneSequence(cfg.camera, depth=8.0)
    gt = lateral_trajectory(2, step=0.03)
    frames = [seq.stereo_pair(T, 0.2) for T in gt]
    vo = StereoVO(cfg)
    t0 = time.time()
    for L, R in frames:
        vo.track(L, R)
    fence(vo.state.T_cw)
    dt = time.time() - t0
    import numpy as np
    from trackingbench_slam_tpu.utils import metrics
    err = np.linalg.norm(metrics.trajectory_positions(vo.poses())[-1]
                         - metrics.trajectory_positions(gt)[-1])
    return {"metric": "two_frame_stereo_vo_s", "value": round(dt, 3),
            "unit": "s (incl. compile)", "extra": {"final_err_m": round(float(err), 4)}}


def config2_mono_bf(quick):
    import jax
    import jax.numpy as jnp
    from trackingbench_slam_tpu.geometry.camera import CameraParams
    from trackingbench_slam_tpu.matchers import matcher as M
    from trackingbench_slam_tpu.models.extractors import extract_orb
    from trackingbench_slam_tpu.models.frame import make_frame
    from trackingbench_slam_tpu.utils.synthetic import (PlaneSequence,
                                                        lateral_trajectory)
    from tests_shim import small_config
    cfg = small_config()
    cam = CameraParams.from_config(cfg.camera)
    seq = PlaneSequence(cfg.camera, depth=8.0)
    n = 4 if quick else 8
    gt = lateral_trajectory(n, step=0.02)
    frames = []
    for T in gt:
        img = seq.render(T)
        f = make_frame(jnp.asarray(img), cfg.extractor.num_features,
                       cfg.pyramid.num_levels, cfg.pyramid.scale_factor)
        frames.append(extract_orb(f, cam, cfg.extractor, cfg.pyramid))
    fence(frames[-1].desc)

    def step(f1, f2):
        return M.search_by_bf(f1.desc, f1.valid, f2.desc, f2.valid)

    dt = bench_fn(step, frames[0], frames[1])
    # match quality across the sequence
    total = 0
    for i in range(n - 1):
        res = step(frames[i + 1], frames[i])
        total += int(res.ok.sum())
    return {"metric": "mono_bf_match_pair_ms", "value": round(dt * 1000, 2),
            "unit": "ms", "extra": {"mean_matches": total // (n - 1)}}


def config3_local_ba(quick):
    import jax.numpy as jnp
    import numpy as np
    from trackingbench_slam_tpu.geometry import se3
    from trackingbench_slam_tpu.geometry.camera import CameraParams
    from trackingbench_slam_tpu.solvers import local_ba
    from trackingbench_slam_tpu.utils.config import CameraConfig
    cam = CameraParams.from_config(
        CameraConfig(width=640, height=480, fx=500, fy=500, cx=320, cy=240))
    rng = np.random.RandomState(0)
    K, Mlm, obs_per = 10, 2048, 4
    T_true = []
    for k in range(K):
        xi = np.concatenate([[0.3 * k, 0, 0], rng.randn(3) * 0.02])
        T_true.append(np.asarray(se3.exp(jnp.asarray(xi, jnp.float32))))
    T_true = np.stack(T_true)
    X = rng.uniform(-3, 3, (Mlm, 3)).astype(np.float32)
    X[:, 2] = rng.uniform(5, 15, Mlm)
    okf = np.repeat(np.arange(Mlm) % (K - obs_per), obs_per) \
        + np.tile(np.arange(obs_per), Mlm)
    olm = np.repeat(np.arange(Mlm), obs_per)
    pc = np.einsum("oij,oj->oi", T_true[okf, :3, :3], X[olm]) + T_true[okf, :3, 3]
    px = pc[:, :2] / pc[:, 2:3] * 500 + np.array([320, 240])
    O = olm.shape[0]
    prob = local_ba.BAProblem(
        T_cw=jnp.asarray(T_true, jnp.float32),
        points=jnp.asarray(X + rng.randn(Mlm, 3).astype(np.float32) * 0.03),
        obs_kf=jnp.asarray(okf, jnp.int32), obs_lm=jnp.asarray(olm, jnp.int32),
        obs_px=jnp.asarray(px, jnp.float32),
        obs_inv_sigma2=jnp.ones((O,), jnp.float32),
        obs_valid=jnp.ones((O,), bool))
    iters = 10
    dt = bench_fn(lambda: local_ba.bundle_adjust(cam, prob, iters=iters,
                                                 num_fixed=2), reps=3)
    return {"metric": "local_ba_iters_per_s", "value": round(iters / dt, 1),
            "unit": "GN-LM iters/s",
            "extra": {"K": K, "landmarks": Mlm, "obs": int(O),
                      "ms_per_iter": round(dt / iters * 1000, 2)}}


def config4_bow(quick):
    import jax.numpy as jnp
    import numpy as np
    from trackingbench_slam_tpu.bow import vocabulary as bow
    rng = np.random.RandomState(0)
    descs = rng.randint(0, 2 ** 32, (20000, 8), dtype=np.uint64).astype(np.uint32)
    voc = bow.train(descs[:5000], branching=8, depth=4, seed=0)
    db = bow.BowDatabase(voc, capacity=256)
    per_img = 2000
    imgs = [jnp.asarray(descs[i * per_img:(i + 1) * per_img])
            for i in range(8)]
    valid = jnp.ones((per_img,), bool)
    for im in imgs[:-1]:
        w, _ = bow.transform(voc, im, valid)
        db.add(bow.bow_vector(voc, w, valid))

    def query(im):
        w, _ = bow.transform(voc, im, valid)
        v = bow.bow_vector(voc, w, valid)
        return db.query(v, top_k=5)

    dt = bench_fn(query, imgs[-1])
    return {"metric": "bow_transform_query_ms", "value": round(dt * 1000, 2),
            "unit": "ms / image (2000 desc)",
            "extra": {"vocab_words": voc.num_words}}


def config5_distributed(quick):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from trackingbench_slam_tpu.geometry import se3
    from trackingbench_slam_tpu.geometry.camera import CameraParams
    from trackingbench_slam_tpu.parallel import dist_ba, mesh as mesh_mod
    from trackingbench_slam_tpu.solvers import local_ba
    from trackingbench_slam_tpu.utils.config import CameraConfig
    n_dev = len(jax.devices())
    cam = CameraParams.from_config(
        CameraConfig(width=640, height=480, fx=500, fy=500, cx=320, cy=240))
    rng = np.random.RandomState(0)
    K, Mlm, obs_per = 8, 1024, 4
    T_true = []
    for k in range(K):
        xi = np.concatenate([[0.3 * k, 0, 0], rng.randn(3) * 0.02])
        T_true.append(np.asarray(se3.exp(jnp.asarray(xi, jnp.float32))))
    T_true = np.stack(T_true)
    X = rng.uniform(-3, 3, (Mlm, 3)).astype(np.float32)
    X[:, 2] = rng.uniform(5, 15, Mlm)
    okf = np.repeat(np.arange(Mlm) % (K - obs_per), obs_per) \
        + np.tile(np.arange(obs_per), Mlm)
    olm = np.repeat(np.arange(Mlm), obs_per)
    pc = np.einsum("oij,oj->oi", T_true[okf, :3, :3], X[olm]) + T_true[okf, :3, 3]
    px = pc[:, :2] / pc[:, 2:3] * 500 + np.array([320, 240])
    O = olm.shape[0]
    prob = local_ba.BAProblem(
        T_cw=jnp.asarray(T_true, jnp.float32),
        points=jnp.asarray(X + 0.02),
        obs_kf=jnp.asarray(okf, jnp.int32), obs_lm=jnp.asarray(olm, jnp.int32),
        obs_px=jnp.asarray(px, jnp.float32),
        obs_inv_sigma2=jnp.ones((O,), jnp.float32),
        obs_valid=jnp.ones((O,), bool))
    results = {}
    for d in sorted({1, n_dev}):
        mesh = mesh_mod.make_mesh(lm=d)
        sp = dist_ba.partition_problem(prob, d)
        dt = bench_fn(lambda: dist_ba.distributed_bundle_adjust(
            mesh, cam, sp, iters=10, num_fixed=2), reps=3)
        results[d] = dt
    eff = results[1] / (results[n_dev] * n_dev) if n_dev > 1 else 1.0
    return {"metric": "dist_ba_scaling_efficiency",
            "value": round(eff, 3), "unit": f"x ({n_dev} devices)",
            "extra": {f"s_at_{d}dev": round(t, 4)
                      for d, t in results.items()}}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--quick", action="store_true")
    p.add_argument("--configs", type=str, default="1,2,3,4,5")
    args = p.parse_args()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # shim so configs can import the canonical small test config
    import types
    shim = types.ModuleType("tests_shim")
    sys.path.insert(0, "/tmp")
    from trackingbench_slam_tpu.utils.config import (
        CameraConfig, ExtractorConfig, MapConfig, PipelineConfig,
        PyramidConfig)

    def small_config():
        cam = CameraConfig(width=320, height=240, fx=300.0, fy=300.0,
                           cx=160.0, cy=120.0, bf=300.0 * 0.2)
        return PipelineConfig(
            camera=cam,
            pyramid=PyramidConfig(num_levels=3, scale_factor=0.8),
            extractor=ExtractorConfig(num_features=512, min_threshold=12,
                                      cell_size=16),
            map=MapConfig(max_keyframes=8, max_points=4096),
            keyframe_every=5)

    shim.small_config = small_config
    sys.modules["tests_shim"] = shim

    fns = {"1": config1_two_frame, "2": config2_mono_bf,
           "3": config3_local_ba, "4": config4_bow,
           "5": config5_distributed}
    platform = jax.devices()[0].platform
    out = []
    for c in args.configs.split(","):
        try:
            r = fns[c](args.quick)
            r["config"] = int(c)
            r["platform"] = platform
            out.append(r)
            print(json.dumps(r), flush=True)
        except Exception as e:  # keep the suite going
            print(json.dumps({"config": int(c), "error": str(e)[:300]}),
                  flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
