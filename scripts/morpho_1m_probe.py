"""Can a single chip align a 1M-cell pair? The reference's own headline is
'hundreds of thousands of cells' per slice (docs/technicals/
spatial_transcriptomics_alignment.md:7) and an 8M-cell atlas (README.md:33).
Runs Morpho end-to-end at NA=NB=1e6, G=50, SVI batch 2k, bounded iters."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np


def main():
    import jax
    import pandas as pd

    import spateo_tpu.core as core
    from spateo_tpu.alignment.methods.morpho import Morpho_pairwise

    N, G = 1_000_000, 50
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 30, (N, 2)).astype(np.float32)
    X = rng.poisson(2.0, (N, G)).astype(np.float32)
    th = 0.25
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]], np.float32)
    ptsA = pts @ R.T + np.array([2.0, -1.0], np.float32)

    def mk(p, X):
        a = core.AnnData(
            X=X, obs=pd.DataFrame(index=np.arange(len(p)).astype(str)),
            var=pd.DataFrame(index=[f"g{j}" for j in range(X.shape[1])]),
        )
        a.obsm["spatial"] = p
        a.uns["__type"] = "UMI"
        return a

    print("building AnnData...", flush=True)
    t0 = time.perf_counter()
    m = Morpho_pairwise(
        sampleA=mk(ptsA, X), sampleB=mk(pts, X.copy()),
        spatial_key="spatial", key_added="align", max_iter=30,
        SVI_mode=True, batch_size=2000, verbose=False,
    )
    t_init = time.perf_counter() - t0
    print(f"init+preprocess: {t_init:.1f}s", flush=True)
    t0 = time.perf_counter()
    m.run()
    jax.effects_barrier()
    XAHat = np.asarray(m.XAHat)
    t_run = time.perf_counter() - t0
    print(f"run (30 iters incl. compile): {t_run:.1f}s -> {t_run/30*1000:.0f} ms/iter upper bound", flush=True)
    # rigid recovery check: compare recovered R against the known rotation
    err = np.abs(np.asarray(m.R) - R).max() if hasattr(m, "R") else float("nan")
    print(f"XAHat shape: {XAHat.shape}, finite: {np.isfinite(XAHat).all()}", flush=True)
    print(f"max |R - R_true|: {err:.4f}", flush=True)
    # second run at the same shape = steady state (compile cached)
    t0 = time.perf_counter()
    m2 = Morpho_pairwise(
        sampleA=mk(ptsA, X), sampleB=mk(pts, X.copy()),
        spatial_key="spatial", key_added="align", max_iter=30,
        SVI_mode=True, batch_size=2000, verbose=False,
    )
    m2.run()
    jax.effects_barrier()
    np.asarray(m2.XAHat)
    t2 = time.perf_counter() - t0
    print(f"steady-state pair (init+30 iters): {t2:.1f}s", flush=True)


if __name__ == "__main__":
    main()
