"""Probe candidate optimizations for the Starro hot stages (morphology, conv).

All timings warm, same process, device-resident inputs, best of 3.
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/starro_opt_probe.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import spateo_tpu  # noqa: F401
from spateo_tpu.ops.image import _conv2d_kernel, _reflect_pad, circle, dilate, erode

H = W = 2048
rng = np.random.default_rng(0)
Xf = jnp.asarray(rng.poisson(0.5, (H, W)).astype(np.float32))
M = jnp.asarray(rng.random((H, W)) > 0.7)


def timeit(name, fn, *args):
    fn(*args)  # compile
    jax.effects_barrier()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:>34}: {min(ts)*1e3:7.2f} ms", flush=True)


# --- baseline dispatch cost
timeit("identity-sum", jax.jit(lambda x: jnp.sum(x)), Xf)

# --- current conv path
K = 5
kern = circle(K).astype(np.float32)


@jax.jit
def conv_now(x):
    r = (K - 1) // 2
    return jnp.sum(_conv2d_kernel(_reflect_pad(x, r), jnp.asarray(kern), K, K, "VALID"))


timeit("conv-current(13tap f32)", conv_now, Xf)


# --- conv via accumulate on padded array without ravel
@jax.jit
def pad_only(x):
    return jnp.sum(_reflect_pad(x, 2))


timeit("reflect-pad-only", pad_only, Xf)


# --- current morphology: close+open with mk=7 circle, f32 conv path
@jax.jit
def morph_now(m):
    m2 = erode(dilate(m, 7), 7)
    m2 = dilate(erode(m2, 7), 7)
    return jnp.sum(m2)


timeit("morph-current(4x f32 conv)", morph_now, M)


# --- boolean decomposed disk morphology
# circle(7) rows: y=0 -> halfwidth 3; y=+-1,+-2 -> 2; y=+-3 -> 0
def _shift2(m, dy, dx, fill):
    out = jnp.roll(m, (dy, dx), (0, 1))
    if dy > 0:
        out = out.at[:dy, :].set(fill)
    elif dy < 0:
        out = out.at[dy:, :].set(fill)
    if dx > 0:
        out = out.at[:, :dx].set(fill)
    elif dx < 0:
        out = out.at[:, dx:].set(fill)
    return out


def _row_halfwidths(k):
    r = (k - 1) // 2
    hw = {}
    for y in range(-r, r + 1):
        xs = [x for x in range(-r, r + 1) if x * x + y * y <= r * r]
        if xs:
            hw[y] = max(xs)
    return hw


def disk_dilate_bool(m, k):
    hw = _row_halfwidths(k)
    r = max(abs(y) for y in hw)
    # horizontal dilations by increasing radius, shared prefix
    H_by_w = {0: m}
    acc = m
    for w in range(1, max(hw.values()) + 1):
        acc = acc | _shift2(m, 0, w, False) | _shift2(m, 0, -w, False)
        H_by_w[w] = acc
    out = None
    for y, w in hw.items():
        t = _shift2(H_by_w[w], y, 0, False)
        out = t if out is None else (out | t)
    return out


def disk_erode_bool(m, k):
    hw = _row_halfwidths(k)
    H_by_w = {0: m}
    acc = m
    for w in range(1, max(hw.values()) + 1):
        acc = acc & _shift2(m, 0, w, True) & _shift2(m, 0, -w, True)
        H_by_w[w] = acc
    out = None
    for y, w in hw.items():
        t = _shift2(H_by_w[w], y, 0, False)  # border = background for erosion
        out = t if out is None else (out & t)
    return out


@jax.jit
def morph_bool(m):
    m2 = disk_erode_bool(disk_dilate_bool(m, 7), 7)
    m2 = disk_dilate_bool(disk_erode_bool(m2, 7), 7)
    return jnp.sum(m2)


timeit("morph-bool-decomposed", morph_bool, M)

# --- parity check vs current (on CPU-sized sample to avoid another compile? do on device)
a = np.asarray(jax.jit(lambda m: erode(dilate(m, 7), 7))(M))
b = np.asarray(jax.jit(lambda m: disk_erode_bool(disk_dilate_bool(m, 7), 7))(M))
print("close parity:", np.array_equal(a, b), flush=True)
c = np.asarray(jax.jit(lambda m: dilate(erode(m, 7), 7))(M))
d = np.asarray(jax.jit(lambda m: disk_dilate_bool(disk_erode_bool(m, 7), 7))(M))
print("open parity:", np.array_equal(c, d), flush=True)


# --- single dilate comparisons
timeit("dilate-current(f32)", jax.jit(lambda m: jnp.sum(dilate(m, 7))), M)
timeit("dilate-bool", jax.jit(lambda m: jnp.sum(disk_dilate_bool(m, 7))), M)


# --- erosion border check: current erode pads with 0 (background) — bool
# version uses roll+set which fills shifted-in rows with True for erode
# horizontal passes but the VERTICAL shift fills False... verify equality is
# what matters (printed above).

# --- conv as bf16 shifted adds (counts exact in bf16? no — accumulate f32)
@jax.jit
def conv_roll(x):
    r = (K - 1) // 2
    xp = _reflect_pad(x, r)
    acc = None
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            if kern[dy + r, dx + r] == 0:
                continue
            t = jax.lax.dynamic_slice(xp, (r + dy, r + dx), (H, W))
            acc = t if acc is None else acc + t
    return jnp.sum(acc)


timeit("conv-dynslice-unroll", conv_roll, Xf)
