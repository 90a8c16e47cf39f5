"""A/B the full fused Starro program after the morphology/conv rewrite.

Measures the same thing bench.py measures (upload + fused program + packed
mask pull) plus a device-resident variant, best of 5.
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/starro_ab.py
"""
import time

import jax
import numpy as np

import spateo_tpu  # noqa: F401
from spateo_tpu.segmentation.starro import starro_em_bp

H = W = 2048


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


X = make_raster(H, W)
starro_em_bp(X, k=5, seed=1, bp_max_iter=50, mask_only=True)  # warm/compile
jax.effects_barrier()
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    starro_em_bp(X, k=5, seed=0, bp_max_iter=50, mask_only=True)
    jax.effects_barrier()
    ts.append(time.perf_counter() - t0)
t = min(ts)
print(f"fused e2e (upload+compute+pull): {t*1e3:.1f} ms -> {H*W/t/1e6:.2f} Mpix/s", flush=True)
print("all times:", [f"{x*1e3:.0f}" for x in ts], flush=True)
