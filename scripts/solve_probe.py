"""Batched tiny-SPD solve strategies on TPU: LU (jnp.linalg.solve) vs
Cholesky+triangular_solve vs pivot-free Gauss-Jordan scan. Subtract the
dispatch-RTT floor via a no-op."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np


def t(label, fn, n=5):
    fn()
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    print(f"{label:40s} {min(times)*1e3:9.1f} ms", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    Q, K = 8192, 12
    rng = np.random.default_rng(0)
    A_ = rng.normal(size=(Q, K, K)).astype(np.float32)
    A = jnp.asarray(np.einsum("qij,qkj->qik", A_, A_) + 0.5 * np.eye(K))
    b = jnp.asarray(rng.normal(size=(Q, K)).astype(np.float32))
    A = jax.block_until_ready(A)

    @jax.jit
    def noop(a, x):
        return x[0, :2] * 1.0

    t("dispatch floor (no-op)", lambda: np.asarray(noop(A, b)))

    @jax.jit
    def lu(a, x):
        return jnp.linalg.solve(a, x[..., None])[..., 0][0, :2]

    t("jnp.linalg.solve (LU)", lambda: np.asarray(lu(A, b)))

    @jax.jit
    def chol(a, x):
        L = jnp.linalg.cholesky(a)
        y = jax.lax.linalg.triangular_solve(L, x[..., None], left_side=True, lower=True)
        z = jax.lax.linalg.triangular_solve(L, y, left_side=True, lower=True, transpose_a=True)
        return z[..., 0][0, :2]

    t("cholesky + 2x triangular_solve", lambda: np.asarray(chol(A, b)))

    @jax.jit
    def gj(a, x):
        # pivot-free Gauss-Jordan on SPD systems, vectorized over the batch:
        # K rank-1 elimination steps, each elementwise on [Q, K, K]
        M = jnp.concatenate([a, x[..., None]], axis=2)  # [Q, K, K+1]

        def step(M, j):
            pivot = M[:, j, :] / M[:, j, j][:, None]  # [Q, K+1]
            M = M - M[:, :, j][:, :, None] * pivot[:, None, :]
            M = M.at[:, j, :].set(pivot)
            return M, None

        M, _ = jax.lax.scan(step, M, jnp.arange(K))
        return M[:, :, K][0, :2]

    t("gauss-jordan scan", lambda: np.asarray(gj(A, b)))

    # correctness
    ref = np.linalg.solve(np.asarray(A), np.asarray(b)[..., None])[..., 0]
    import jax.numpy as jnp2
    L = jnp.linalg.cholesky(A)
    y = jax.lax.linalg.triangular_solve(L, b[..., None], left_side=True, lower=True)
    z = np.asarray(jax.lax.linalg.triangular_solve(L, y, left_side=True, lower=True, transpose_a=True))[..., 0]
    print("chol max err:", float(np.abs(z - ref).max()))


if __name__ == "__main__":
    main()
