"""Does the axon tunnel overlap host->device transfers with in-flight compute?

Times the Starro fused pipeline over a stream of 2048^2 tiles two ways:
  (a) strict sequential: upload tile i -> compute -> pull mask, repeat
  (b) pipelined: dispatch compute on tile i, immediately start uploading
      tile i+1, then pull tile i's mask
If (b) < (a), a streaming API is worth shipping.
"""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np

import bench as B
from spateo_tpu.segmentation.starro import starro_em_bp


def main():
    import jax
    import jax.numpy as jnp

    H = W = 2048
    tiles = [B.make_raster(H, W, seed=s).astype(np.int8) for s in range(4)]
    print("tiles ready", flush=True)

    # warm compile
    starro_em_bp(tiles[0], k=5, seed=1, bp_max_iter=50, mask_only=True)
    jax.effects_barrier()
    print("compiled", flush=True)

    # (a) strict sequential
    for rep in range(2):
        t0 = time.perf_counter()
        for X in tiles:
            _, mask = starro_em_bp(X, k=5, seed=0, bp_max_iter=50, mask_only=True)
        seq = time.perf_counter() - t0
        print(f"sequential   {seq*1e3:8.1f} ms  ({len(tiles)*H*W/seq/1e6:.2f} Mpix/s)", flush=True)

    # (b) pipelined: separate upload from compute using the internals
    from spateo_tpu.segmentation.starro import _starro_em_bp_fused, _use_pallas_bp, circle, create_neighbor_offsets

    neighborhood = circle(3)
    offsets = tuple(map(tuple, create_neighbor_offsets(neighborhood.astype(bool)).tolist()))
    key = jax.random.PRNGKey(0)
    n_samples = max(int(H * W * 0.001), 1000)

    def compute(dev):
        return _starro_em_bp_fused(dev, key, 5, 7, n_samples, 2000, 1e-6,
                                   offsets, 0.6, 0.4, 1e-6, 50, _use_pallas_bp(offsets), True, "bfloat16")

    for rep in range(2):
        t0 = time.perf_counter()
        dev = jnp.asarray(tiles[0])
        outs = []
        for i in range(len(tiles)):
            scores, mask = compute(dev)          # async dispatch
            if i + 1 < len(tiles):
                dev = jnp.asarray(tiles[i + 1])  # upload during compute?
            outs.append(np.asarray(mask))        # blocks on tile i
        pipe = time.perf_counter() - t0
        print(f"pipelined    {pipe*1e3:8.1f} ms  ({len(tiles)*H*W/pipe/1e6:.2f} Mpix/s)", flush=True)


if __name__ == "__main__":
    main()
