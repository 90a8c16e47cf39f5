"""Roofline the two flagship kernels (VERDICT r4 #4):

1. the fused Starro program (EM+BP scoring + Otsu + morphology) on a
   device-resident 2048^2 tile;
2. one Morpho EM iteration at the benched 20k x 2k SVI shape.

For each: XLA cost_analysis FLOPs + bytes accessed, measured wall clock,
and the implied fraction of chip peak (v5e: ~197 TFLOP/s bf16 MXU,
~49 TFLOP/s f32 MXU, ~819 GB/s HBM). Elementwise/transcendental work runs
on the VPU (~4 TFLOP/s-class), so a program can be "compute-bound" well
below MXU peak; the bytes number tells which wall it actually hits.
"""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np

PEAK_BF16 = 197e12
PEAK_F32 = 49e12
PEAK_HBM = 819e9


def fmt(flops, bytes_, secs, label):
    fl = flops / secs if secs else 0
    bw = bytes_ / secs if secs else 0
    print(
        f"{label}:\n"
        f"  wall {secs*1e3:8.2f} ms   flops {flops/1e9:9.2f} G   bytes {bytes_/1e9:7.3f} GB\n"
        f"  achieved {fl/1e12:6.2f} TFLOP/s = {100*fl/PEAK_F32:5.1f}% of f32-MXU peak"
        f" ({100*fl/PEAK_BF16:4.1f}% of bf16)\n"
        f"  achieved {bw/1e9:6.1f} GB/s    = {100*bw/PEAK_HBM:5.1f}% of HBM peak\n"
        f"  arithmetic intensity {flops/max(bytes_,1):6.1f} flop/byte"
        f" (ridge f32 = {PEAK_F32/PEAK_HBM:.0f})",
        flush=True,
    )


def starro_roofline():
    import jax
    import bench
    from spateo_tpu.segmentation import starro as st_

    H = W = 2048
    X = bench.make_raster(H, W, seed=0)
    dev = st_.upload_tile(X)
    offsets = tuple(map(tuple, st_.create_neighbor_offsets(st_.circle(3).astype(bool)).tolist()))
    n_samples = max(int(H * W * 0.001), 1000)
    key = jax.random.PRNGKey(0)
    args = (dev, key, 5, 7, n_samples, 2000, 1e-6, offsets, 0.6, 0.4, 1e-6, 50,
            st_._use_pallas_bp(offsets), True, "bfloat16")

    fn = st_._starro_em_bp_fused

    def run():
        _, m = fn(*args)
        np.asarray(m)

    run()
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    secs = min(times)

    # cost analysis of the same lowered program
    lowered = fn.lower(*args)
    ca = lowered.compile().cost_analysis()
    flops = float(ca.get("flops", 0))
    bytes_ = float(ca.get("bytes accessed", 0))
    fmt(flops, bytes_, secs, f"Starro fused 2048^2 (50 BP iters, device-resident; {H*W/secs/1e6:.1f} Mpix/s)")
    return ca


def morpho_roofline():
    import jax
    import __graft_entry__ as g

    fn, args0 = g.entry()
    # rescale to the benched shape: NA=NB=20000, B=2000, G=50, K=15
    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    NA = NB = 20000
    G, K, B = 50, 15, 2000
    coordsA = jnp.asarray(rng.uniform(0, 1, (NA, 2)).astype(np.float32))
    coordsB = jnp.asarray(rng.uniform(0, 1, (NB, 2)).astype(np.float32))
    expA = jnp.asarray(np.abs(rng.normal(1, 0.3, (NA, G))).astype(np.float32))
    expB = jnp.asarray(np.abs(rng.normal(1, 0.3, (NB, G))).astype(np.float32))
    inducing = coordsA[:K]
    batch_idx = jnp.asarray(rng.choice(NB, B, replace=False).astype(np.int32))
    args = (coordsA, coordsB, expA, expB, inducing, batch_idx,
            jnp.asarray(0.1, jnp.float32), jnp.asarray(0.5, jnp.float32),
            jnp.ones(NA, jnp.float32), jnp.eye(2, dtype=jnp.float32),
            jnp.zeros(2, jnp.float32), jnp.zeros((K, 2), jnp.float32))
    step = jax.jit(fn)

    def run():
        out = step(*args)
        np.asarray(out[-1])

    run()
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    secs = min(times)
    ca = step.lower(*args).compile().cost_analysis()
    flops = float(ca.get("flops", 0))
    bytes_ = float(ca.get("bytes accessed", 0))
    fmt(flops, bytes_, secs, f"Morpho EM iteration 20k x 2k SVI (incl. dispatch + scalar pull)")
    return ca


if __name__ == "__main__":
    ca1 = starro_roofline()
    ca2 = morpho_roofline()
    # top cost keys for the curious
    for name, ca in (("starro", ca1), ("morpho", ca2)):
        ks = {k: v for k, v in ca.items() if isinstance(v, float) and v > 0}
        print(name, "cost keys:", sorted(ks.items(), key=lambda kv: -kv[1])[:6], flush=True)
