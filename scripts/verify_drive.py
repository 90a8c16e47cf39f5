"""Drive the public API end-to-end after the morphology/conv + plotting
changes (verify-skill recipe):

1. `st.cs` segmentation flow on the default backend (real TPU when run
   under axon) — scores+mask through the public surface, morphology
   applied, device checked.
2. The same flow + the sharded starro path on an 8-device CPU mesh
   (set MESH=1 env: forces CPU before first backend use).
3. `st.pl` dotplot/network changes rendered headless.
"""
import os
import sys

MESH = os.environ.get("MESH") == "1"
if MESH:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    import jax

    jax.config.update("jax_platforms", "cpu")

import matplotlib

matplotlib.use("Agg")
import numpy as np

sys.path.insert(0, "/root/repo")
import spateo_tpu as st


def seg_flow():
    import jax

    rng = np.random.default_rng(0)
    X = rng.poisson(0.4, (256, 256)).astype(np.float32)
    X[60:120, 60:120] += rng.negative_binomial(8, 0.4, (60, 60))
    from spateo_tpu.segmentation.starro import starro_em_bp

    scores, mask = starro_em_bp(X, k=5, seed=0, bp_max_iter=10)
    scores = np.asarray(scores)
    mask = np.asarray(mask)
    assert scores.shape == X.shape and mask.dtype == bool
    assert 0 < mask.sum() < mask.size, mask.sum()
    # mask mostly covers the planted cell block
    assert mask[70:110, 70:110].mean() > 0.5, mask[70:110, 70:110].mean()
    # staged path agrees with the fused one (stage-for-stage semantics)
    from spateo_tpu.ops.image import mclose_mopen
    from spateo_tpu.ops.threshold import threshold_otsu

    thr = threshold_otsu(scores)
    staged_mask = np.asarray(mclose_mopen(scores >= thr, 7))
    agree = (staged_mask == mask).mean()
    assert agree > 0.995, agree
    print(f"  devices: {jax.devices()}  mask px: {mask.sum()}  staged-agree: {agree:.4f}", flush=True)

    if MESH:
        from spateo_tpu.parallel.mesh import create_mesh
        from spateo_tpu.segmentation.starro import starro_em_bp_sharded

        mesh = create_mesh(axis_names=("data",))
        s2, m2 = starro_em_bp_sharded(X, mesh=mesh, k=5, seed=0, bp_max_iter=10)
        # GSPMD changes reduction orders; scores span ~12 decades so compare
        # with a scale-relative tolerance
        np.testing.assert_allclose(np.asarray(s2), scores, rtol=2e-3, atol=1e-9)
        assert (np.asarray(m2) == mask).mean() > 0.999
        print(f"  sharded starro on {mesh.shape} == single-device", flush=True)


def plotting_flow():
    import networkx as nx
    import pandas as pd

    rng = np.random.default_rng(1)
    n = 200
    a = st.AnnData(
        X=rng.poisson(2.0, (n, 4)).astype(np.float32),
        obs=pd.DataFrame({"leiden": rng.choice(["a", "b", "c"], n)}, index=[f"c{i}" for i in range(n)]),
        var=pd.DataFrame(index=[f"g{j}" for j in range(4)]),
    )
    a.obsm["spatial"] = rng.uniform(0, 50, (n, 2)).astype(np.float32)
    st.SKM.init_adata_type(a, "UMI")
    ax = st.pl.dotplot(a, var_names=["g0", "g1", "g2"], cat_key="leiden",
                       dendrogram=True, swap_axes=True, save_show_or_return="return")
    assert len(ax.figure.axes) >= 2  # main + dendrogram panel (+colorbar)
    G = nx.DiGraph()
    G.add_edge("A", "B", kind="act", weight=2.0)
    G.add_edge("B", "C", kind="inh", weight=1.0)
    ax = st.pl.plot_network(G, title="net", layout="circular", edge_label="kind",
                            edge_thickness_attr="weight", highlight_neighbors_on_hover=True,
                            save_show_or_return="return")
    assert ax.get_title() == "net" and len(ax.lines) == 2
    print("  plotting flows render", flush=True)


print(f"== verify drive (MESH={MESH})", flush=True)
seg_flow()
plotting_flow()
print("OK", flush=True)
