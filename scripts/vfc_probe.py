"""Profile the SparseVFC bench workload piece by piece on the real chip.

Dissects bench.py's vfc_bench() (N=100k, M=100, 60 iters): host-side prep
(unique/ctrl selection), device transfers, the EM while_loop itself, scalar
pulls, and the Jacobian batch — to find where the 0.6 s goes.
"""
import time

import numpy as np


def t(label, fn, n=3):
    fn()  # warmup
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    print(f"{label:42s} {min(times)*1e3:9.1f} ms")
    return min(times)


def main():
    import jax
    import jax.numpy as jnp

    from spateo_tpu.ops.vfc import SparseVFC, _median_positive_sqdist, _sparsevfc_em, con_K

    N, M, MAXIT = 100_000, 100, 60
    rng = np.random.default_rng(0)
    Xp = rng.uniform(-1, 1, (N, 3)).astype(np.float32)
    V = np.cross(np.broadcast_to([0.0, 0.0, 1.0], Xp.shape), Xp).astype(np.float32)
    V += rng.normal(0, 0.05, V.shape).astype(np.float32)

    # 1. host prep: unique + choice
    def prep():
        uniq, uniq_idx = np.unique(Xp, axis=0, return_index=True)
        ctrl_idx = uniq_idx[rng.choice(len(uniq), M, replace=False)]
        return Xp[ctrl_idx]

    t("np.unique(axis=0) + ctrl choice", prep)

    # 2. median heuristic (device)
    sub = Xp[rng.choice(N, 2000, replace=False)]
    t("median bandwidth (device+pull)", lambda: float(_median_positive_sqdist(jnp.asarray(sub))))

    # 3. upload X, Y
    def upload():
        a = jnp.asarray(Xp)
        b = jnp.asarray(V)
        jax.block_until_ready((a, b))
        return a, b

    t("upload X+V (2.4 MB)", upload)
    Xj, Yj = upload()
    ctrl = Xp[:M].copy()
    ctrl_j = jnp.asarray(ctrl)
    beta = jnp.asarray(1.0, jnp.float32)

    # 4. EM while_loop alone (device time)
    def em():
        s, K = _sparsevfc_em(Xj, Yj, ctrl_j, beta, 0.9, 5.0, 3.0, 0.0, 1e-5, MAXIT)
        jax.block_until_ready(s["C"])
        return s

    t("EM while_loop (60 it, device only)", em)
    s = em()

    # 5. scalar pulls as done in SparseVFC (float() x5 + arrays)
    def pulls():
        float(s["gamma"]); float(s["sigma2"]); int(s["i"]); float(s["tecr"]); float(s["E"])
        np.asarray(s["C"]); np.asarray(s["V"]); np.asarray(s["P"])

    t("result pulls (5 scalars + C/V/P)", pulls)

    # 6. jacobian batch + pull
    @jax.jit
    def jac_batch(pts, ctrl_, C, b):
        diff = pts[:, None, :] - ctrl_[None, :, :]
        Kk = jnp.exp(-b * jnp.sum(diff**2, -1))
        return jnp.einsum("nm,nmd,me->nde", Kk, -2.0 * b * diff, C)

    def jac():
        J = jac_batch(Xj, ctrl_j, s["C"], beta)
        np.asarray(J)

    t("jacobian batch + pull (3.6 MB)", jac)

    # 7. full SparseVFC end to end (what the bench times, minus jac)
    def full():
        SparseVFC(Xp, V, M=M, MaxIter=MAXIT, ecr=0.0, seed=0)

    t("SparseVFC() end-to-end", full)


if __name__ == "__main__":
    main()
