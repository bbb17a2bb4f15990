"""Substage bisect of ONE grouped-BA LM iteration (VERDICT r4 next #1:
the keyframe+BA path caps the headline; ba_scaling says ~10.5 ms/iter at
L=4096,O=16,K=16 but nothing attributes it).

Probes, each its own compiled program over the same pre-uploaded problems,
outputs reduced to device scalars (ssum discipline):
    residuals      _grouped_residuals + chi2
    blocks         build_grouped_blocks (includes residuals)
    vinv           batched (L,3,3) inverse, given blocks
    schur          full schur_solve, given blocks
    cost           total_cost pass (a second residual sweep)
    iter1          one full LM iteration
    loop/iter      (t(12 iters) - t(2 iters)) / 10  — the honest per-iter

    python benchmarks/bisect_ba_iter.py [--cpu] [--landmarks 4096]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--landmarks", type=int, default=4096)
    p.add_argument("--reps", type=int, default=4)
    args = p.parse_args()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import functools
    import jax.numpy as jnp
    import numpy as np
    from trackingbench_slam_tpu.geometry import camera as cam_mod
    from trackingbench_slam_tpu.geometry import se3
    from trackingbench_slam_tpu.solvers import local_ba as lba
    from trackingbench_slam_tpu.utils.config import CameraConfig

    cam = cam_mod.CameraParams.from_config(
        CameraConfig(width=1226, height=370, fx=707.0, fy=707.0,
                     cx=613.0, cy=185.0, bf=707.0 * 0.54))
    K, L, O = 16, args.landmarks, 16

    # same synthetic problem as ba_scaling.py (inlined so its timers
    # don't run)
    def make_problem(seed):
        r = np.random.RandomState(seed)
        T_cw = []
        for k in range(K):
            xi = np.concatenate([[0.1 * k, 0, 0], r.randn(3) * 0.005])
            T_cw.append(np.asarray(se3.exp(jnp.asarray(xi, jnp.float32))))
        T_cw = np.stack(T_cw)
        X = r.uniform(-8, 8, (L, 3)).astype(np.float32)
        X[:, 2] = r.uniform(4, 40, L)
        kf = np.tile(np.arange(K, dtype=np.int32)[None, :O] % K, (L, 1))
        Rm = np.stack([t[:3, :3] for t in T_cw])
        tm = np.stack([t[:3, 3] for t in T_cw])
        pc = np.einsum("kij,lj->lki", Rm, X) + tm[None]
        pc = np.take_along_axis(pc, kf[..., None], axis=1)
        px = np.stack([pc[..., 0] / pc[..., 2] * 707.0 + 613.0,
                       pc[..., 1] / pc[..., 2] * 707.0 + 185.0], axis=-1)
        return lba.GroupedBAProblem(
            T_cw=jnp.asarray(T_cw, jnp.float32),
            points=jnp.asarray(X + r.randn(L, 3).astype(np.float32) * 0.05),
            obs_kf=jnp.asarray(kf),
            obs_px=jnp.asarray(px.astype(np.float32)),
            obs_inv_sigma2=jnp.ones((L, O), jnp.float32),
            obs_valid=jnp.asarray(np.ones((L, O), bool)))

    problems = [make_problem(s) for s in range(args.reps)]

    def ssum(*xs):
        return sum(jnp.sum(jnp.asarray(x, jnp.float32)) for t in xs
                   for x in jax.tree_util.tree_leaves(t))

    def drain(outs):
        for o in outs:
            np.asarray(jax.device_get(o))

    def probe(label, fn, arglists, base=0.0):
        outs = [fn(*a) for a in arglists]
        drain(outs)
        t0 = time.time()
        outs = [fn(*a) for a in arglists]
        drain(outs)
        dt = (time.time() - t0) / len(arglists) * 1000 - base
        print(f"{label:24s} {dt:8.2f} ms", flush=True)
        return dt

    HD = 2.4477

    args1 = [(gp,) for gp in problems]
    trivial = jax.jit(lambda gp: gp.T_cw.sum() + 1.0)
    base = probe("launch overhead", trivial, args1)

    @jax.jit
    def p_resid(gp):
        r, pc, J, Jl, row_ok = lba._grouped_residuals(
            cam, gp.T_cw, gp.points, gp)
        chi2 = lba._grouped_chi2(r, row_ok, gp.obs_inv_sigma2)
        return ssum(r, chi2, J, Jl)

    @jax.jit
    def p_blocks(gp):
        return ssum(lba.build_grouped_blocks(cam, gp.T_cw, gp.points, gp,
                                             HD))

    # blocks as device inputs for the solve-only probes
    blk = jax.jit(lambda gp: lba.build_grouped_blocks(
        cam, gp.T_cw, gp.points, gp, HD))
    blocks = [tuple(jax.device_put(x) for x in blk(gp)[:5])
              for gp in problems]
    argsB = blocks

    @jax.jit
    def p_vinv(U, V, Wb, bp, bl):
        Vd = lba.damp_diagonal(V, 1e-4, 3)
        return ssum(jnp.linalg.inv(Vd))

    @jax.jit
    def p_schur(U, V, Wb, bp, bl):
        dxi, dX = lba.schur_solve(U, V, Wb, bp, bl, jnp.float32(1e-4))
        return ssum(dxi, dX)

    @jax.jit
    def p_cost(gp):
        r, pc, _, _, row_ok = lba._grouped_residuals(
            cam, gp.T_cw, gp.points, gp)
        chi2 = lba._grouped_chi2(r, row_ok, gp.obs_inv_sigma2)
        ok = gp.obs_valid & (gp.obs_kf >= 0) & (pc[..., 2] > 0.05)
        return jnp.sum(jnp.where(ok, lba._huber_rho(chi2, HD), 0.0))

    @jax.jit
    def p_iter1(gp):
        # ONE full LM iteration open-coded in a single program: if this
        # matches the loop's marginal per-iteration cost, the math is the
        # cost; if it matches the sum of the isolated component probes,
        # the fori_loop structure itself is adding overhead
        U, V, Wb, bp, bl, c0 = lba.build_grouped_blocks(
            cam, gp.T_cw, gp.points, gp, HD)
        dxi, dX = lba.schur_solve(U, V, Wb, bp, bl, jnp.float32(1e-4))
        from trackingbench_slam_tpu.geometry import se3
        T_new = jax.vmap(lambda d, T: se3.compose(se3.exp(d), T))(
            dxi, gp.T_cw)
        X_new = gp.points + dX
        r, pc, _, _, row_ok = lba._grouped_residuals(cam, T_new, X_new, gp)
        chi2 = lba._grouped_chi2(r, row_ok, gp.obs_inv_sigma2)
        ok = gp.obs_valid & (gp.obs_kf >= 0) & (pc[..., 2] > 0.05)
        c1 = jnp.sum(jnp.where(ok, lba._huber_rho(chi2, HD), 0.0))
        return ssum(T_new, X_new, c0, c1)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def p_loop(gp, iters):
        T, X = lba.bundle_adjust_grouped.__wrapped__(
            cam, gp, iters=iters, huber_delta=HD, num_fixed=1)
        return ssum(T, X)

    probe("residuals", p_resid, args1, base)
    probe("blocks(build)", p_blocks, args1, base)
    probe("vinv only", p_vinv, argsB, base)
    probe("schur_solve", p_schur, argsB, base)
    probe("cost pass", p_cost, args1, base)
    probe("iter1 open-coded", p_iter1, args1, base)
    ts = {}
    for it in (2, 4, 8, 12):
        ts[it] = probe(f"loop {it} iters",
                       lambda gp, it=it: p_loop(gp, iters=it), args1, base)
    print(f"{'per-iteration (12-2)':24s} {(ts[12] - ts[2]) / 10:8.2f} ms",
          flush=True)
    print(f"{'per-iteration (4-2)':24s} {(ts[4] - ts[2]) / 2:8.2f} ms",
          flush=True)
    print(f"{'per-iteration (12-8)':24s} {(ts[12] - ts[8]) / 4:8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
