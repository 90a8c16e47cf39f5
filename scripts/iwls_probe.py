"""Dissect the MuSIC IWLS workload on the chip: W build, GEMMs, batched
solve, scan iteration, end-to-end."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np


def t(label, fn, n=3):
    fn()
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    print(f"{label:44s} {min(times)*1e3:9.1f} ms", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    Q = N = 8192
    K = 12
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.uniform(0, 10, (N, 2)).astype(np.float32))
    X = rng.normal(0, 0.3, (N, K)).astype(np.float32)
    X[:, 0] = 1.0
    Xd = jnp.asarray(X)
    yd = jnp.asarray(rng.poisson(1.0, N).astype(np.float32))

    @jax.jit
    def build_W(c):
        d2 = jnp.sum(c**2, 1)[:, None] + jnp.sum(c**2, 1)[None, :] - 2.0 * c @ c.T
        return jnp.exp(-jnp.maximum(d2, 0.0) / 2.0)

    t("W build [8192^2]", lambda: np.asarray(build_W(coords)[0, :4]))
    W = build_W(coords)
    W = jax.block_until_ready(W)

    F = (Xd[:, :, None] * Xd[:, None, :]).reshape(N, K * K)

    @jax.jit
    def xtx_gemm(wt):
        return (wt @ F).reshape(Q, K, K)

    t("xtx GEMM  [q,n]@[n,k^2]", lambda: np.asarray(xtx_gemm(W)[0, 0, :2]))
    xtx = jax.block_until_ready(xtx_gemm(W) + jnp.eye(K)[None])

    @jax.jit
    def bsolve(a, b):
        return jnp.linalg.solve(a, b[..., None])[..., 0]

    rhs = jnp.ones((Q, K))
    t("batched solve [8192,12,12]", lambda: np.asarray(bsolve(xtx, rhs)[0, :2]))

    @jax.jit
    def eta_mm(beta):
        return beta @ Xd.T

    beta = jnp.ones((Q, K))
    t("eta GEMM [q,k]@[k,n]", lambda: np.asarray(eta_mm(beta)[0, :2]))

    @jax.jit
    def one_iter(eta):
        mu = jnp.exp(jnp.clip(eta, -30, 30))
        g = 1.0 / jnp.maximum(mu, 1e-8)
        z = eta + (yd[None, :] - mu) * g
        w_irls = 1.0 / (jnp.maximum(mu, 1e-8) * g * g + 1e-12)
        wt = w_irls * W
        xtx = (wt @ F).reshape(Q, K, K) + jnp.eye(K)[None]
        xty = (wt * z) @ Xd
        b = jnp.clip(jnp.linalg.solve(xtx, xty[..., None])[..., 0], -5, 5)
        return b @ Xd.T

    eta = jnp.zeros((Q, N))
    t("one full IRLS iteration", lambda: np.asarray(one_iter(eta)[0, :2]))

    from spateo_tpu.tools.CCI_effects_modeling.regression_utils import _iwls_batch_kernel

    @jax.jit
    def fit_all(c, y_, X_):
        d2 = jnp.sum(c**2, 1)[:, None] + jnp.sum(c**2, 1)[None, :] - 2.0 * c @ c.T
        Wk = jnp.exp(-jnp.maximum(d2, 0.0) / 2.0)
        return _iwls_batch_kernel(y_, X_, Wk, 0.0, 5.0, "poisson", 25)

    t("fit_all end-to-end (25 iters)", lambda: np.asarray(fit_all(coords, yd, Xd)[0]))


if __name__ == "__main__":
    main()
