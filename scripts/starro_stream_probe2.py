"""Why is bench's stream slower than the probe? Dissect: float32 tiles vs
int8 tiles, narrow-upload host cost, per-pass timings."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np

import bench as B
from spateo_tpu.segmentation.starro import _narrow_upload, starro_em_bp_stream


def main():
    import jax

    H = W = 2048
    N = 4
    tiles_f32 = [B.make_raster(H, W, seed=s) for s in range(N)]
    tiles_i8 = [t.astype(np.int8) for t in tiles_f32]

    t0 = time.perf_counter()
    for t in tiles_f32:
        _narrow_upload(t)
    print(f"_narrow_upload(f32) host cost {1e3*(time.perf_counter()-t0)/N:.1f} ms/tile", flush=True)

    list(starro_em_bp_stream(tiles_i8[:1], k=5, seed=1, bp_max_iter=50, mask_only=True))
    jax.effects_barrier()
    print("compiled", flush=True)

    for name, tiles in (("int8", tiles_i8), ("f32 ", tiles_f32)):
        for rep in range(3):
            t0 = time.perf_counter()
            out = [m for _, m in starro_em_bp_stream(tiles, k=5, seed=0, bp_max_iter=50, mask_only=True)]
            jax.effects_barrier()
            dt = time.perf_counter() - t0
            print(f"stream {name} {dt*1e3:8.1f} ms  ({N*H*W/dt/1e6:.2f} Mpix/s)", flush=True)


if __name__ == "__main__":
    main()
