"""Jacobi Pallas sweep variants: pltpu.roll vs concat shifts vs unrolled."""
import sys, time
from functools import partial

sys.path.insert(0, "/root/repo")
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H = W = 1024
    N_SWEEPS = 500
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
    upd_np = np.zeros((H, W), np.float32)
    upd_np[1:-1, 1:-1] = 1
    upd = jnp.asarray(upd_np)

    def call(kern, n):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(f.shape, f.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            input_output_aliases={0: 0},
        )

    def kern_roll(f_ref, u_ref, o_ref):
        def sweep(i, _):
            fv = o_ref[:]
            avg = 0.25 * (pltpu.roll(fv, H - 1, 0) + pltpu.roll(fv, 1, 0)
                          + pltpu.roll(fv, W - 1, 1) + pltpu.roll(fv, 1, 1))
            o_ref[:] = fv + u_ref[:] * (avg - fv)
            return 0
        jax.lax.fori_loop(0, N_SWEEPS, sweep, 0)

    def kern_concat(f_ref, u_ref, o_ref):
        def sweep(i, _):
            fv = o_ref[:]
            up = jnp.concatenate([fv[1:], fv[:1]], 0)
            dn = jnp.concatenate([fv[-1:], fv[:-1]], 0)
            lf = jnp.concatenate([fv[:, 1:], fv[:, :1]], 1)
            rt = jnp.concatenate([fv[:, -1:], fv[:, :-1]], 1)
            avg = 0.25 * (up + dn + lf + rt)
            o_ref[:] = fv + u_ref[:] * (avg - fv)
            return 0
        jax.lax.fori_loop(0, N_SWEEPS, sweep, 0)

    def kern_slices(f_ref, u_ref, o_ref):
        # read shifted windows straight from the ref (no roll op)
        def sweep(i, _):
            fv = o_ref[:]
            acc = jnp.zeros_like(fv)
            acc = acc.at[:-1].add(o_ref[1:, :])
            acc = acc.at[1:].add(o_ref[:-1, :])
            acc = acc + jnp.concatenate([fv[:, 1:], fv[:, :1]], 1)
            acc = acc + jnp.concatenate([fv[:, -1:], fv[:, :-1]], 1)
            o_ref[:] = fv + u_ref[:] * (0.25 * acc - fv)
            return 0
        jax.lax.fori_loop(0, N_SWEEPS, sweep, 0)

    for name, kern in (("roll", kern_roll), ("concat", kern_concat), ("slices", kern_slices)):
        try:
            fn = call(kern, N_SWEEPS)
            run = lambda: np.asarray(fn(f, upd)[:2, :2])
            run()
            ts = []
            for _ in range(3):
                t0 = time.perf_counter(); run(); ts.append(time.perf_counter() - t0)
            dt = min(ts)
            print(f"{name:8s} {dt*1e3:8.1f} ms/500 sweeps -> {H*W*N_SWEEPS/dt/1e9:6.1f} Gpix-it/s", flush=True)
        except Exception as e:
            print(f"{name:8s} FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
