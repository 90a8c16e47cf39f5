"""Morpho 20k-pair time breakdown: init vs per-iteration slope, via runs at
different max_iter (all timings end with a host pull)."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np


def main():
    import jax
    import pandas as pd

    import spateo_tpu.core as core
    from spateo_tpu.alignment.methods.morpho import Morpho_pairwise

    N, G = 20000, 50
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 10, (N, 2)).astype(np.float32)
    X = rng.poisson(2.0, (N, G)).astype(np.float32)
    th = 0.3
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]], np.float32)
    ptsA = pts @ R.T + np.array([1.5, -0.8], np.float32)

    def mk(p, Xm):
        a = core.AnnData(X=Xm.copy(), obs=pd.DataFrame(index=[f"c{i}" for i in range(len(p))]),
                         var=pd.DataFrame(index=[f"g{j}" for j in range(Xm.shape[1])]))
        a.obsm["spatial"] = p.copy()
        a.uns["__type"] = "UMI"
        return a

    def run(iters, seed):
        t0 = time.perf_counter()
        m = Morpho_pairwise(sampleA=mk(ptsA, X), sampleB=mk(pts, X),
                            spatial_key="spatial", key_added="align", max_iter=iters, verbose=False)
        t_init = time.perf_counter() - t0
        t0 = time.perf_counter()
        m.run()
        jax.effects_barrier()
        np.asarray(m.XAHat)
        return t_init, time.perf_counter() - t0

    for iters in (1, 200):  # compile warmup per shape
        run(iters, 0)
    for iters in (1, 50, 200):
        ti = []
        tr = []
        for s in range(3):
            a, b = run(iters, s + 1)
            ti.append(a); tr.append(b)
        print(f"iters={iters:4d}: init {min(ti)*1e3:6.0f} ms   run {min(tr)*1e3:7.0f} ms", flush=True)


if __name__ == "__main__":
    main()
