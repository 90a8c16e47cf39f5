"""In-situ stage attribution for the fused Starro program at 2048^2.

Builds PREFIX programs of `_starro_em_bp_fused` (stage 1, stages 1-2, ...)
and times each warm on the real chip. Prefixes are honest in-situ costs:
every later stage depends on the earlier ones, so XLA cannot dead-code the
prefix body, and cross-stage fusion inside the prefix matches the full
program. Differences of consecutive prefixes = per-stage cost.

Run: timeout 3000 python scripts/starro_attribution.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import spateo_tpu  # noqa: F401  (config: persistent cache)
from spateo_tpu.ops.bp import _bp_kernel, create_neighbor_offsets
from spateo_tpu.ops.em import _nbn_em_batched, nb_logpmf
from spateo_tpu.ops.image import _conv2d_kernel, _reflect_pad, circle, dilate, erode
from spateo_tpu.ops.threshold import _otsu_from_values

H = W = 2048
K, MK = 5, 7
N_SAMPLES = max(int(H * W * 0.001), 1000)
BP_MAX_ITER = 50
neighborhood = circle(3).astype(bool)
OFFSETS = tuple(map(tuple, create_neighbor_offsets(neighborhood).tolist()))


def make_raster(h, w, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.poisson(0.2, (h, w)).astype(np.float32)
    for _ in range(60):
        cy, cx = rng.integers(0, h), rng.integers(0, w)
        r = int(rng.integers(8, 40))
        y0, y1 = max(cy - r, 0), min(cy + r + 1, h)
        x0, x1 = max(cx - r, 0), min(cx + r + 1, w)
        yy, xx = np.mgrid[y0:y1, x0:x1]
        m = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
        X[y0:y1, x0:x1][m] += rng.negative_binomial(8, 0.35, int(m.sum())).astype(np.float32)
    return X


def stages(X, key, upto):
    X = X.astype(jnp.float32)
    kern = jnp.asarray(circle(K), jnp.float32)
    r = (K - 1) // 2
    res = _conv2d_kernel(_reflect_pad(X, r), kern, K, K, "VALID")
    if upto == 1:
        return jnp.sum(res)
    flat = res.ravel()
    n = flat.shape[0]
    thr = jnp.maximum(_otsu_from_values(flat, jnp.min(flat), jnp.max(flat), 256), 1.0)
    m = flat > thr
    n_fg = jnp.sum(m)
    n_bg = n - n_fg
    w0 = jnp.stack([n_bg, n_fg]).astype(jnp.float32) / n
    sum_all = jnp.sum(flat)
    sum_fg = jnp.sum(jnp.where(m, flat, 0.0))
    mu_bg = (sum_all - sum_fg) / jnp.maximum(n_bg, 1)
    mu_fg = jnp.where(n_fg > 0, sum_fg / jnp.maximum(n_fg, 1), thr * 2.0)
    sq_all = jnp.sum(flat * flat)
    sq_fg = jnp.sum(jnp.where(m, flat * flat, 0.0))
    var_bg = (sq_all - sq_fg) / jnp.maximum(n_bg, 1) - mu_bg**2
    var_fg = jnp.where(n_fg > 0, sq_fg / jnp.maximum(n_fg, 1) - mu_fg**2, thr * 4.0)
    mu0 = jnp.stack([mu_bg, mu_fg])
    var0 = jnp.stack([var_bg, var_fg])
    var0 = jnp.where(var0 <= mu0, mu0 * 1.1, var0)
    if upto == 2:
        return thr + jnp.sum(w0) + jnp.sum(mu0) + jnp.sum(var0)
    logw = jnp.log(jnp.log1p(flat + 1.0) + 1e-30)
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(key, (n,), minval=1e-12, maxval=1.0)))
    _, idx = jax.lax.top_k(logw + gumbel, N_SAMPLES)
    samp = flat[idx]
    if upto == 3:
        return jnp.sum(samp)
    w_, r_, p_ = _nbn_em_batched(
        samp[None, :], jnp.ones((1, N_SAMPLES), bool), w0[None, :], mu0[None, :], var0[None, :],
        max_iter=2000, precision=1e-6,
    )
    if upto == 4:
        return jnp.sum(w_) + jnp.sum(r_) + jnp.sum(p_)
    bg_cond = jnp.exp(nb_logpmf(res, r_[0, 0], p_[0, 0]))
    cell_cond = jnp.exp(nb_logpmf(res, r_[0, 1], p_[0, 1]))
    phi = jnp.stack([bg_cond, cell_cond], axis=-1)
    phi = phi / jnp.maximum(jnp.sum(phi, axis=-1, keepdims=True), 1e-30)
    if upto == 5:
        return jnp.sum(phi)
    scores = _bp_kernel(phi, OFFSETS, 0.6, 0.4, 1e-6, BP_MAX_ITER)
    if upto == 6:
        return jnp.sum(scores)
    sflat = scores.ravel()
    thr2 = _otsu_from_values(sflat, jnp.min(sflat), jnp.max(sflat), 256)
    if upto == 7:
        return thr2
    mask = scores >= thr2
    mask = erode(dilate(mask, MK), MK)
    mask = dilate(erode(mask, MK), MK)
    return jnp.sum(mask)


NAMES = {
    1: "conv",
    2: "otsu-init",
    3: "gumbel-topk",
    4: "em",
    5: "pmf-conditionals",
    6: "bp50",
    7: "otsu2",
    8: "morphology",
}


def main():
    X = jnp.asarray(make_raster(H, W).astype(np.int8))
    key = jax.random.PRNGKey(1)
    prev = 0.0
    for upto in range(1, 9):
        fn = jax.jit(lambda X, key, u=upto: stages(X, key, u))
        t0 = time.perf_counter()
        np.asarray(fn(X, key))
        compile_t = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(X, key))
            ts.append(time.perf_counter() - t0)
        cur = min(ts)
        print(
            f"prefix {upto} (+{NAMES[upto]:>18}): {cur*1e3:8.1f} ms"
            f"  (delta {100*(cur-prev)/max(cur,1e-9):5.1f}%* {(cur-prev)*1e3:7.1f} ms)"
            f"  [compile {compile_t:.0f}s]",
            flush=True,
        )
        prev = cur


if __name__ == "__main__":
    main()
