"""Starro EM+BP segmentation as ONE fused XLA program.

The staged path (`icell._score_pixels` -> `threshold_otsu` ->
`apply_threshold`) is correct but pays a host<->device round-trip between
every stage — on a tunneled TPU each `np.asarray` sync ships a multi-MB
raster over the wire. This module fuses the entire scoring pipeline
(conv -> Otsu init -> weighted downsample -> NB-mixture EM ->
conditionals -> loopy BP -> Otsu threshold -> close/open morphology)
into a single jitted function: one dispatch in, one [H, W] bool mask out.

Semantics match the staged path stage-for-stage (reference parity:
spateo/segmentation/icell.py:195 `_score_pixels` with method='EM+BP' +
utils.py:196 `apply_threshold`); the only intended difference is the
weighted without-replacement downsample, which uses the Gumbel top-k
trick on device instead of `np.random.choice` on host (identical
distribution, different stream).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.bp import _bp_kernel, _use_pallas_bp, create_neighbor_offsets
from ..ops.em import _nbn_em_batched, muvar_to_lamtheta, nb_logpmf  # noqa: F401
from ..ops.image import _binary_row_runs, _conv2d_rowsum, _reflect_pad, circle, dilate, erode
from ..ops.threshold import _otsu_from_values


@partial(
    jax.jit,
    static_argnames=(
        "k",
        "mk",
        "n_samples",
        "em_max_iter",
        "bp_max_iter",
        "bp_p",
        "bp_q",
        "bp_precision",
        "bp_msg_dtype",
        "offsets",
        "use_pallas_bp",
        "pack_mask",
    ),
)
def _starro_em_bp_fused(
    X: jnp.ndarray,  # [H, W] raw UMI raster
    key: jnp.ndarray,  # PRNG key for the downsample
    k: int,
    mk: int,
    n_samples: int,
    em_max_iter: int,
    em_precision: float,
    offsets: Tuple[Tuple[int, int], ...],
    bp_p: float,
    bp_q: float,
    bp_precision: float,
    bp_max_iter: int,
    use_pallas_bp: bool = False,
    pack_mask: bool = False,
    bp_msg_dtype: str = "float32",
):
    # one traced graph = the composition below; splitting it into the same
    # helpers the batched-EM stream uses keeps this path's output identical
    res, samp, w0, mu0, var0 = _starro_density_init_sample(X, key, k, n_samples)

    # 4. NB-mixture EM on the sample (shared batched kernel, B=1)
    w_, r_, p_ = _nbn_em_batched(
        samp[None, :],
        jnp.ones((1, n_samples), bool),
        w0[None, :],
        mu0[None, :],
        var0[None, :],
        max_iter=em_max_iter,
        precision=em_precision,
    )

    return _starro_score_mask(
        res, w_[0], r_[0], p_[0], mk, offsets, bp_p, bp_q, bp_precision,
        bp_max_iter, use_pallas_bp, pack_mask, bp_msg_dtype,
    )


def _starro_density_init_sample(
    X: jnp.ndarray,  # [H, W] raw UMI raster
    key: jnp.ndarray,  # PRNG key for the downsample
    k: int,
    n_samples: int,
):
    """Steps 1-3 of the fused Starro program: density convolution, Otsu
    initial NB params, Gumbel top-k weighted downsample. Returns
    (density [H, W], sample [n_samples], w0 [2], mu0 [2], var0 [2]), all
    device-resident."""
    X = X.astype(jnp.float32)

    # 1. density: circular convolution with symmetric padding. The circle
    # kernel's rows are contiguous runs of ones, so the prefix-sum window
    # path applies — exact for UMI counts (integer-valued, row sums << 2^24)
    # and ~13x cheaper than the tap unroll at 2048^2.
    r = (k - 1) // 2
    rows = _binary_row_runs(np.asarray(circle(k), np.float32))
    res = _conv2d_rowsum(_reflect_pad(X, r), rows, k, k, "VALID")
    flat = res.ravel()
    n = flat.shape[0]

    # 2. initial NB params from an Otsu split (icell.py `_initial_nb_params`,
    # branch-free)
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
    var0 = jnp.where(var0 <= mu0, mu0 * 1.1, var0)  # NB needs var > mu

    # 3. weighted downsample without replacement: Gumbel top-k over
    # log-weights log(log1p(x + 1)) reproduces np.random.choice(p=w) in
    # distribution without leaving the device. approx_max_k is the
    # TPU-native top-k (13x faster at 4M keys: 0.49 vs 6.3 ms measured on
    # v5e); at recall 0.99 it swaps ~1% of the true Gumbel top-k for
    # near-boundary keys — a perturbation far below the sampler's own
    # noise floor for a 2-component NB fit. On CPU it lowers to exact
    # top_k, so tests see the exact sampler.
    logw = jnp.log(jnp.log1p(flat + 1.0) + 1e-30)
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(key, (n,), minval=1e-12, maxval=1.0)))
    _, idx = jax.lax.approx_max_k(logw + gumbel, n_samples, recall_target=0.99)
    samp = flat[idx]
    return res, samp, w0, mu0, var0


def _starro_score_mask(
    res: jnp.ndarray,  # [H, W] density raster (step-1 output)
    w_: jnp.ndarray,  # [2] fitted mixture weights
    r_: jnp.ndarray,  # [2] fitted NB r
    p_: jnp.ndarray,  # [2] fitted NB theta
    mk: int,
    offsets: Tuple[Tuple[int, int], ...],
    bp_p: float,
    bp_q: float,
    bp_precision: float,
    bp_max_iter: int,
    use_pallas_bp: bool = False,
    pack_mask: bool = False,
    bp_msg_dtype: str = "float32",
):
    """Steps 5-7 of the fused Starro program: per-pixel NB conditionals,
    loopy BP marginals, Otsu threshold + close/open morphology."""
    del w_  # parity: the conditional stack is normalized, weights cancel

    # 5. per-pixel conditionals. (A 32k-entry log-ratio table + gather for
    # integer rasters was tried and REVERTED: inside this fused program XLA
    # already amortizes the gammaln chains — the A/B measured 382 vs 393 ms
    # at 2048^2 with bit-identical masks, so the table bought nothing.)
    bg_cond = jnp.exp(nb_logpmf(res, r_[0], p_[0]))
    cell_cond = jnp.exp(nb_logpmf(res, r_[1], p_[1]))
    phi = jnp.stack([bg_cond, cell_cond], axis=-1)
    phi = phi / jnp.maximum(jnp.sum(phi, axis=-1, keepdims=True), 1e-30)

    # 6. loopy BP marginals (Pallas message kernel on TPU, XLA otherwise —
    # this function is jitted, so the dispatch is baked in per backend)
    if use_pallas_bp:
        from ..ops.bp_pallas import bp_kernel_pallas

        # delta checked every 10 iterations: the full-raster convergence
        # reduction costs ~0.36 ms/check at 2048^2 (profiled), and blocked
        # checks land within 10 iterations of the per-iteration exit
        scores = bp_kernel_pallas(phi, bp_p, bp_q, bp_precision, bp_max_iter, check_every=10,
                                  msg_dtype=bp_msg_dtype)
    else:
        scores = _bp_kernel(phi, offsets, bp_p, bp_q, bp_precision, bp_max_iter)

    # 7. Otsu threshold + close/open morphology (apply_threshold semantics)
    sflat = scores.ravel()
    thr2 = _otsu_from_values(sflat, jnp.min(sflat), jnp.max(sflat), 256)
    mask = scores >= thr2
    mask = erode(dilate(mask, mk), mk)  # close
    mask = dilate(erode(mask, mk), mk)  # open
    if pack_mask:
        # 8x smaller device->host transfer on tunneled TPUs
        return scores, jnp.packbits(mask.ravel())
    return scores, mask


# phase dispatchers for the batched-EM stream (`em_batch > 1`): same traced
# ops as the fused program, split so ONE `_nbn_em_batched` while_loop can
# serve a whole chunk of tiles. The EM loop is launch-overhead-bound
# (~43 us/iteration at [B, 2, S] for any small B — measured round 5), so
# batching B tiles' fits amortizes its ~1000-iteration cost B-fold.
_starro_phase_density = jax.jit(
    _starro_density_init_sample, static_argnames=("k", "n_samples")
)
_starro_phase_mask = jax.jit(
    _starro_score_mask,
    static_argnames=(
        "mk", "offsets", "bp_p", "bp_q", "bp_precision", "bp_max_iter",
        "use_pallas_bp", "pack_mask", "bp_msg_dtype",
    ),
)


@partial(jax.jit, static_argnames=("em_max_iter",))
def _starro_phase_em(samps, w0s, mu0s, var0s, em_max_iter, em_precision):
    return _nbn_em_batched(
        jnp.stack(samps),
        jnp.ones((len(samps), samps[0].shape[0]), bool),
        jnp.stack(w0s),
        jnp.stack(mu0s),
        jnp.stack(var0s),
        max_iter=em_max_iter,
        precision=em_precision,
    )


def _narrow_upload(X: np.ndarray) -> np.ndarray:
    """Lossless narrow upload dtype: UMI rasters are small non-negative
    integers, and the tunnel's host->device bandwidth dominates the fused
    pipeline's wall time — int8 when counts fit (the common case), else
    int16; float rasters holding non-integral values upload unchanged."""
    if np.issubdtype(X.dtype, np.floating) and X.size and float(np.abs(X).max()) < 32767 and np.all(X == np.round(X)):
        amax = float(np.abs(X).max())
        return X.astype(np.int8 if amax < 127 else np.int16)
    if np.issubdtype(X.dtype, np.integer) and (X.size == 0 or np.abs(X).max() < 32767):
        amax = float(np.abs(X).max()) if X.size else 0.0
        return X.astype(np.int8 if amax < 127 else np.int16)
    return X


# --- lossless tile upload codec -------------------------------------------
#
# The serialized host->device transfer is the only Starro pipeline stage
# that does not run at the device ceiling (VERDICT r3: 23 Mpix/s benched vs
# the ~34 Mpix/s compute ceiling, gap = dense-int8 upload through a tunnel
# whose bandwidth swings). UMI rasters compress losslessly:
#   * 'packed2'  — counts clipped to 2 bits, FOUR pixels per byte; crumb
#     value 3 means "escape": the true value lives in a side stream of
#     uint8s gathered on device by a prefix-sum over the escape flags
#     (order-preserving, so no per-escape index is stored — 1 byte per
#     escape instead of 5), plus a tiny COO list for values > 255. Wins on
#     UMI rasters whose counts are geometric-ish (most pixels 0-2), the
#     typical Stereo-seq profile: ~0.25 + P(>=3) bytes/px.
#   * 'packed4'  — counts clipped to 4 bits, two pixels per byte, plus a
#     COO exception list for the rare pixels > 15 (bin1 GEM tiles top out
#     near 14 counts/px — the test fixture's max IS 14 — so exceptions are
#     empty or tiny). ~0.5-0.65 bytes/px at any occupancy; beats packed2
#     when counts 3-15 are common (P(>=3) > 0.25).
#   * 'coo'      — flat uint32 index + narrow value per nonzero pixel;
#     wins on sparse tiles (occupancy < ~11%), e.g. chip background
#     regions (reference reads these as sparse COO too, io/bgi.py:162).
#   * 'dense'    — the narrow dense raster (fallback; always correct).
# encode_tile picks whichever is smallest; the matching _decode_* program
# reconstructs the exact int raster on device (bit-lossless), so masks are
# identical to the dense path. Exception/COO lengths are padded to
# power-of-two buckets so streams of varying tiles reuse compiled decoders.


def _pad_bucket(idx: np.ndarray, val: np.ndarray, fill_idx: int, fill_val: int):
    """Pad (idx, val) to the next power-of-two length with an idempotent
    entry (scatter uses .set, so repeating a real assignment is a no-op)."""
    n = len(idx)
    if n == 0:
        cap = 1
    else:
        cap = 1 << (max(int(n) - 1, 0)).bit_length()
        cap = max(cap, 16)
    pad = cap - n
    if pad:
        idx = np.concatenate([idx, np.full(pad, fill_idx, idx.dtype)])
        val = np.concatenate([val, np.full(pad, fill_val, val.dtype)])
    return idx, val


def encode_tile(X) -> tuple:
    """Choose the cheapest lossless upload encoding for a UMI tile.

    Accepts a dense array or a scipy sparse matrix (never densified when
    COO wins). Returns one of:
      ('dense',   X_narrow, shape)
      ('packed4', packed_u8, exc_idx_u32, exc_val, shape)
      ('coo',     idx_u32, val, shape)
    """
    from scipy import sparse as sp

    if sp.issparse(X):
        coo = X.tocoo(copy=True)  # copy: sum_duplicates mutates in place
        coo.sum_duplicates()  # the device decode SETs per pixel; scipy SUMS duplicates
        shape = coo.shape
        size = shape[0] * shape[1]
        vmax = float(coo.data.max()) if coo.nnz else 0.0
        vmin = float(coo.data.min()) if coo.nnz else 0.0
        integral = np.all(coo.data == np.round(coo.data)) if coo.nnz else True
        # the decoded raster is int16: negatives and counts > 32766 would wrap
        if integral and vmin >= 0 and vmax <= 32766:
            vdt = np.uint8 if vmax < 256 else np.uint16
            idx = (coo.row.astype(np.int64) * shape[1] + coo.col.astype(np.int64)).astype(np.uint32)
            val = coo.data.astype(vdt)
            coo_bytes = _pad_bucket(idx, val, 0, 0)[0].nbytes + val.nbytes
            if coo_bytes < size + size // 2:  # beats dense and likely packed4
                idx, val = _pad_bucket(idx, val, int(idx[0]) if len(idx) else 0, int(val[0]) if len(val) else 0)
                return ("coo", idx, val, shape)
        X = np.asarray(X.todense())

    X = np.asarray(X)
    shape = X.shape
    size = X.size
    # one narrow cast + lossless check (cheaper than _narrow_upload's
    # round()+abs() chain: this runs per tile on the stream's host path)
    if size == 0:
        return ("dense", _narrow_upload(X), shape)
    if np.issubdtype(X.dtype, np.floating):
        flat = X.ravel().astype(np.int16)
        if not np.array_equal(flat, X.ravel()):  # non-integral or overflow
            return ("dense", X, shape)
    elif np.issubdtype(X.dtype, np.integer):
        flat = X.ravel()
        if flat.min() < 0 or flat.max() > 32766:
            return ("dense", _narrow_upload(X), shape)
        flat = flat.astype(np.int16, copy=False)
    else:
        return ("dense", X, shape)
    if flat.min() < 0:
        return ("dense", _narrow_upload(X), shape)

    vmax = int(flat.max())
    nnz = int(np.count_nonzero(flat))
    n_exc = int(np.count_nonzero(flat > 15))
    vdt = np.uint8 if vmax < 256 else np.uint16
    vsize = np.dtype(vdt).itemsize

    dense_bytes = size * (1 if vmax < 127 else 2)
    coo_bytes = nnz * (4 + vsize)
    pack_bytes = (size + 1) // 2 + n_exc * (4 + vsize)
    n_esc = int(np.count_nonzero(flat >= 3))
    n_exc2 = int(np.count_nonzero(flat > 255))
    pack2_bytes = (size + 3) // 4 + n_esc + n_exc2 * 6

    best = min(dense_bytes, coo_bytes, pack_bytes, pack2_bytes)
    if best == dense_bytes:
        return ("dense", flat.astype(np.int8 if vmax < 127 else np.int16, copy=False).reshape(shape), shape)
    if best == coo_bytes:
        nnz_idx = np.flatnonzero(flat).astype(np.uint32)
        coo_val = flat[nnz_idx.astype(np.int64)].astype(vdt)
        idx, val = _pad_bucket(nnz_idx, coo_val, int(nnz_idx[0]) if len(nnz_idx) else 0,
                               int(coo_val[0]) if len(coo_val) else 0)
        return ("coo", idx, val, shape)
    if best == pack2_bytes:
        base = np.minimum(flat, 3).astype(np.uint8)
        pad = (-size) % 4
        if pad:
            base = np.concatenate([base, np.zeros(pad, np.uint8)])
        packed = base[0::4] | (base[1::4] << 2) | (base[2::4] << 4) | (base[3::4] << 6)
        # escape stream: true values (clipped to u8) for every pixel >= 3,
        # in raster order — the device decode recovers positions with a
        # prefix sum over the escape crumbs, so no indices are shipped
        esc_val = np.minimum(flat[flat >= 3], 255).astype(np.uint8)
        cap = max(16, 1 << (max(len(esc_val) - 1, 0)).bit_length()) if len(esc_val) else 16
        if cap > len(esc_val):
            # pad values are never gathered (prefix-sum positions stay
            # < n_esc), so zero-fill is safe
            esc_val = np.concatenate([esc_val, np.zeros(cap - len(esc_val), np.uint8)])
        exc2_idx = np.flatnonzero(flat > 255).astype(np.uint32)
        exc2_val = flat[exc2_idx.astype(np.int64)].astype(np.int16)
        # idempotent padding: re-setting pixel 0 to its own true value (or
        # repeating a real exception) is a no-op under scatter .set
        if len(exc2_idx):
            exc2_idx, exc2_val = _pad_bucket(exc2_idx, exc2_val, int(exc2_idx[0]), int(exc2_val[0]))
        else:
            exc2_idx, exc2_val = _pad_bucket(exc2_idx, exc2_val, 0, int(flat[0]))
        return ("packed2", packed, esc_val, exc2_idx, exc2_val, shape)
    exc_idx = np.flatnonzero(flat > 15).astype(np.uint32)
    exc_val = flat[exc_idx.astype(np.int64)].astype(vdt)
    base = np.minimum(flat, 15).astype(np.uint8)
    if size % 2:
        base = np.concatenate([base, np.zeros(1, np.uint8)])
    packed = base[0::2] | (base[1::2] << 4)
    if len(exc_idx):
        # pad with a REAL exception entry: re-setting the same idx/val is a
        # no-op regardless of scatter ordering
        exc_idx, exc_val = _pad_bucket(exc_idx, exc_val, int(exc_idx[0]), int(exc_val[0]))
    else:
        # no exceptions: pad with pixel 0's clipped value (also a no-op)
        fill_val = int(min(int(flat[0]), 15)) if size else 0
        exc_idx, exc_val = _pad_bucket(exc_idx, exc_val, 0, fill_val)
    return ("packed4", packed, exc_idx, exc_val, shape)


@partial(jax.jit, static_argnames=("H", "W"))
def _decode_packed4(packed, exc_idx, exc_val, H: int, W: int):
    lo = (packed & 15).astype(jnp.int16)
    hi = (packed >> 4).astype(jnp.int16)
    flat = jnp.stack([lo, hi], axis=1).reshape(-1)[: H * W]
    flat = flat.at[exc_idx].set(exc_val.astype(jnp.int16))
    return flat.reshape(H, W)


@partial(jax.jit, static_argnames=("H", "W"))
def _decode_coo(idx, val, H: int, W: int):
    return jnp.zeros((H * W,), jnp.int16).at[idx].set(val.astype(jnp.int16)).reshape(H, W)


@partial(jax.jit, static_argnames=("H", "W"))
def _decode_packed2(packed, esc_val, exc_idx, exc_val, H: int, W: int):
    """Decode the 2-bit plane + prefix-gathered escape stream on device.

    Crumb 3 marks an escape; the k-th escape (raster order) reads
    ``esc_val[k]``, recovered by an exclusive prefix sum over the escape
    flags — a single ``cumsum`` the TPU executes at HBM bandwidth."""
    crumbs = (packed[:, None] >> jnp.array([0, 2, 4, 6], jnp.uint8)[None, :]) & 3
    flat = crumbs.reshape(-1)[: H * W].astype(jnp.int16)
    esc = flat == 3
    pos = jnp.cumsum(esc.astype(jnp.int32)) - 1
    gathered = esc_val[jnp.clip(pos, 0, esc_val.shape[0] - 1)].astype(jnp.int16)
    flat = jnp.where(esc, gathered, flat)
    flat = flat.at[exc_idx].set(exc_val.astype(jnp.int16))
    return flat.reshape(H, W)


def _upload_encoded(enc) -> jnp.ndarray:
    """Ship an `encode_tile` result to the device and decode it there."""
    if enc[0] == "dense":
        return jnp.asarray(enc[1])
    if enc[0] == "coo":
        _, idx, val, (H, W) = enc
        return _decode_coo(jnp.asarray(idx), jnp.asarray(val), int(H), int(W))
    if enc[0] == "packed2":
        _, packed, esc_val, exc_idx, exc_val, (H, W) = enc
        return _decode_packed2(
            jnp.asarray(packed), jnp.asarray(esc_val), jnp.asarray(exc_idx), jnp.asarray(exc_val), int(H), int(W)
        )
    _, packed, exc_idx, exc_val, (H, W) = enc
    return _decode_packed4(jnp.asarray(packed), jnp.asarray(exc_idx), jnp.asarray(exc_val), int(H), int(W))


def upload_tile(X) -> jnp.ndarray:
    """Upload a tile with the cheapest lossless encoding and decode it on
    device; returns the device-resident int raster (dispatch is async, so a
    caller streaming tiles overlaps this with in-flight compute)."""
    return _upload_encoded(encode_tile(X))


def starro_em_bp(
    X: np.ndarray,
    k: int = 5,
    mk: Optional[int] = None,
    downsample: float = 0.001,
    em_max_iter: int = 2000,
    em_precision: float = 1e-6,
    bp_k: int = 3,
    bp_square: bool = False,
    bp_p: float = 0.6,
    bp_q: float = 0.4,
    bp_precision: float = 1e-6,
    bp_max_iter: int = 100,
    bp_msg_dtype: str = "bfloat16",
    seed: Optional[int] = None,
    mask_only: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Fused Starro EM+BP scoring + masking: returns (scores, mask).

    Drop-in for `_score_pixels(X, k, 'EM+BP')` followed by
    `apply_threshold(scores, k+2, threshold_otsu(scores))`, in one device
    dispatch. `mask_only=True` additionally bit-packs the mask on device
    (8x smaller pull over a tunneled link) and returns it as a host bool
    array.

    BP messages are STORED in bf16 by default (arithmetic stays f32 inside
    the Pallas kernel): at 2048^2/50 iters this halves the loop's HBM
    traffic for a measured 15% end-to-end speedup with a bit-identical
    mask (IoU 1.000000 vs bp_msg_dtype='float32' on the benchmark raster).
    Pass ``bp_msg_dtype='float32'`` to store full-precision messages.

    ``X`` may be dense or a scipy sparse matrix; either way the upload uses
    the cheapest lossless encoding (see `encode_tile`) and is reconstructed
    bit-exactly on device, so masks are identical to a dense upload.
    """
    from scipy import sparse as _sp

    if not _sp.issparse(X):
        X = np.asarray(X)
    shape = X.shape
    dev = upload_tile(X)
    mk = mk or k + 2
    n = int(shape[0]) * int(shape[1])
    # floor of 1000 samples: the fractional downsample degenerates on small
    # rasters (0.001 of 128^2 = 16 samples -> unstable NB fits); at the
    # production raster sizes this path targets (>=1 Mpixel) the floor is
    # inactive and the fraction semantics match the staged path exactly
    n_samples = max(int(n * downsample), 1000) if downsample <= 1 else int(downsample)
    n_samples = min(n_samples, n)
    neighborhood = np.ones((bp_k, bp_k)) if bp_square else circle(bp_k)
    offsets = tuple(map(tuple, create_neighbor_offsets(neighborhood.astype(bool)).tolist()))
    key = jax.random.PRNGKey(0 if seed is None else seed)
    scores, mask = _starro_em_bp_fused(
        dev,
        key,
        k,
        mk,
        n_samples,
        em_max_iter,
        float(em_precision),
        offsets,
        float(bp_p),
        float(bp_q),
        float(bp_precision),
        int(bp_max_iter),
        _use_pallas_bp(offsets),
        bool(mask_only),
        str(bp_msg_dtype),
    )
    if mask_only:
        mask = np.unpackbits(np.asarray(mask))[:n].reshape(shape).astype(bool)
    return scores, mask


def starro_em_bp_stream(
    tiles,
    k: int = 5,
    mk: Optional[int] = None,
    downsample: float = 0.001,
    em_max_iter: int = 2000,
    em_precision: float = 1e-6,
    bp_k: int = 3,
    bp_square: bool = False,
    bp_p: float = 0.6,
    bp_q: float = 0.4,
    bp_precision: float = 1e-6,
    bp_max_iter: int = 100,
    bp_msg_dtype: str = "bfloat16",
    seed: Optional[int] = None,
    mask_only: bool = False,
    em_batch: int = 1,
):
    """Pipelined Starro over a stream of rasters (tiles / fields of view).

    Yields the same ``(scores, mask)`` per tile as calling
    :func:`starro_em_bp` in a loop, but pipelines four stages: encode(i+2)
    on a worker thread, upload(i+1), device compute(i), and an async
    device->host copy of tile i-1's packed mask. One extra dispatch is kept
    in flight so the blocking mask pull always rides under the next tile's
    compute. On a tunneled TPU this nearly doubles steady-state throughput
    vs the pull-after-each-dispatch loop (measured: 23 -> ~38 Mpix/s on
    four 2048^2 tiles; device compute alone is ~74 Mpix/s — the remainder
    is tunnel bandwidth jitter); production Stereo-seq chips are 10-20k
    pixels square, i.e. dozens of such tiles.

    Same-shape tiles reuse one compiled program; a shape change just
    triggers one recompile (or a compile-cache hit). Each tile uses the
    same ``seed``, so with the default ``em_batch=1`` outputs are
    bit-identical to per-tile calls.

    ``em_batch > 1`` amortizes the NB-EM `while_loop` — the fused program's
    single launch-overhead-bound stage (~43 us/iteration regardless of
    batch size, ~1000 iterations at precision 1e-6, i.e. ~45 ms of the
    ~118 ms per-2048^2-tile program) — by fitting up to ``em_batch``
    consecutive same-shape tiles' mixtures in ONE batched EM. Per-tile
    math is unchanged (the batched kernel freezes each tile's row at ITS
    convergence); only f32 reduction tiling differs, so masks may differ
    from per-tile calls on threshold-straddling pixels (IoU >= 0.999
    pinned in tests, typically bit-identical). Each tile's density raster
    stays device-resident between phases: budget ``em_batch * H * W * 8``
    bytes of HBM (~134 MB at em_batch=4, 2048^2).
    """
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    from scipy import sparse as _sp

    def _as_tile(t):
        return t if _sp.issparse(t) else np.asarray(t)

    it = iter(tiles)
    try:
        X = _as_tile(next(it))
    except StopIteration:
        return
    mk_eff = mk or k + 2
    neighborhood = np.ones((bp_k, bp_k)) if bp_square else circle(bp_k)
    offsets = tuple(map(tuple, create_neighbor_offsets(neighborhood.astype(bool)).tolist()))
    key = jax.random.PRNGKey(0 if seed is None else seed)
    use_pallas = _use_pallas_bp(offsets)

    if em_batch > 1:
        yield from _stream_batched_em(
            it, X, em_batch, k, mk_eff, downsample, em_max_iter, em_precision,
            offsets, bp_p, bp_q, bp_precision, bp_max_iter, bp_msg_dtype,
            key, mask_only, use_pallas,
        )
        return

    def dispatch(dev, size):
        n_samples = max(int(size * downsample), 1000) if downsample <= 1 else int(downsample)
        return _starro_em_bp_fused(
            dev, key, k, mk_eff, min(n_samples, size), em_max_iter, float(em_precision),
            offsets, float(bp_p), float(bp_q), float(bp_precision), int(bp_max_iter),
            use_pallas, bool(mask_only), str(bp_msg_dtype),
        )

    def finalize(out, shape, size):
        scores, mask = out
        if mask_only:
            mask = np.unpackbits(np.asarray(mask))[:size].reshape(shape).astype(bool)
        return scores, mask

    def start_host_copy(out):
        # begin the device->host transfer of the (bit-packed) mask without
        # blocking, so the pull rides under the NEXT tile's compute; harmless
        # no-op on runtimes that don't support async copies
        if mask_only:
            try:
                out[1].copy_to_host_async()
            except (AttributeError, RuntimeError):  # pragma: no cover
                pass

    # four-stage pipeline: a worker thread ENCODES tile i+2 while the main
    # thread UPLOADS tile i+1, the device COMPUTES tile i, and tile i-1's
    # mask STREAMS back over an async host copy. Keeping one extra dispatch
    # in flight means the blocking pull of tile i-1 overlaps tile i's
    # compute, so steady-state wall time per tile is just
    # max(compute, upload) instead of compute + pull.
    ex = ThreadPoolExecutor(max_workers=1)
    try:
        pending = deque()  # (encode_future, shape)
        pending.append((ex.submit(encode_tile, X), X.shape))
        nxt = next(it, None)
        if nxt is not None:
            X2 = _as_tile(nxt)
            pending.append((ex.submit(encode_tile, X2), X2.shape))

        fut, shape = pending.popleft()
        dev = _upload_encoded(fut.result())
        size = int(shape[0]) * int(shape[1])
        inflight = deque()  # (out, shape, size): dispatched, host copy started
        while dev is not None:
            out = dispatch(dev, size)  # async: device computes tile i
            start_host_copy(out)
            inflight.append((out, shape, size))
            nxt = next(it, None)
            if nxt is not None:
                X3 = _as_tile(nxt)
                pending.append((ex.submit(encode_tile, X3), X3.shape))  # encode i+2
            if pending:
                fut2, shape2 = pending.popleft()
                dev = _upload_encoded(fut2.result())  # upload i+1 over compute i
                shape = shape2
                size = int(shape[0]) * int(shape[1])
            else:
                dev = None
            # yield everything but the newest dispatch: its pull then
            # overlaps the next iteration's compute
            while len(inflight) > (1 if dev is not None else 0):
                yield finalize(*inflight.popleft())
    finally:
        ex.shutdown(wait=False)


def _stream_batched_em(
    it, first, em_batch, k, mk, downsample, em_max_iter, em_precision,
    offsets, bp_p, bp_q, bp_precision, bp_max_iter, bp_msg_dtype,
    key, mask_only, use_pallas,
):
    """Chunked stream body for ``em_batch > 1``: density/init/sample per
    tile, ONE batched NB-EM per chunk of consecutive same-shape tiles,
    then BP+mask per tile. Chunk i's (bit-packed) mask pulls ride under
    chunk i+1's encode/upload/compute, mirroring the per-tile pipeline at
    chunk granularity."""
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    from scipy import sparse as _sp

    def _as_tile(t):
        return t if _sp.issparse(t) else np.asarray(t)

    ex = ThreadPoolExecutor(max_workers=1)
    try:

        def chunks():
            # group consecutive same-shape tiles, <= em_batch per chunk;
            # encode is submitted the moment a tile is pulled, so the
            # worker thread encodes chunk i+1 while chunk i computes
            buf, shape = [], None
            t = first
            while t is not None:
                if buf and (t.shape != shape or len(buf) == em_batch):
                    yield buf, shape
                    buf = []
                shape = t.shape
                buf.append(ex.submit(encode_tile, t))
                nxt = next(it, None)
                t = _as_tile(nxt) if nxt is not None else None
            if buf:
                yield buf, shape

        def finalize(out, shape, size):
            scores, mask = out
            if mask_only:
                mask = np.unpackbits(np.asarray(mask))[:size].reshape(shape).astype(bool)
            return scores, mask

        prev = deque()
        for futs, shape in chunks():
            size = int(shape[0]) * int(shape[1])
            n_samples = max(int(size * downsample), 1000) if downsample <= 1 else int(downsample)
            n_samples = min(n_samples, size)
            # phase A (per tile, async): upload -> density/init/sample
            phase_a = [
                _starro_phase_density(_upload_encoded(f.result()), key, k, n_samples)
                for f in futs
            ]
            # one batched EM while_loop for the whole chunk
            w_, r_, p_ = _starro_phase_em(
                [a[1] for a in phase_a],
                [a[2] for a in phase_a],
                [a[3] for a in phase_a],
                [a[4] for a in phase_a],
                em_max_iter,
                float(em_precision),
            )
            # phase B (per tile, async): conditionals -> BP -> mask
            outs = []
            for j, a in enumerate(phase_a):
                out = _starro_phase_mask(
                    a[0], w_[j], r_[j], p_[j], mk, offsets, float(bp_p),
                    float(bp_q), float(bp_precision), int(bp_max_iter),
                    use_pallas, bool(mask_only), str(bp_msg_dtype),
                )
                if mask_only:
                    try:
                        out[1].copy_to_host_async()
                    except (AttributeError, RuntimeError):  # pragma: no cover
                        pass
                outs.append((out, shape, size))
            # yield chunk i-1 now: its pulls overlap this chunk's compute
            while prev:
                yield finalize(*prev.popleft())
            prev.extend(outs)
        while prev:
            yield finalize(*prev.popleft())
    finally:
        ex.shutdown(wait=False)


def starro_em_bp_sharded(
    X: np.ndarray,
    mesh=None,
    mesh_axis: str = "data",
    **kwargs,
):
    """Multi-chip Starro: the raster's ROWS shard over the mesh's data axis
    (SURVEY §2.12 — data parallelism over pixel tiles). The same fused
    program runs under GSPMD: the k-circle convolution and the BP message
    shifts become halo exchanges (collective-permute over ICI), the EM /
    Otsu reductions become psums, and the Gumbel top-k downsample runs as a
    cross-shard top-k. The Pallas BP kernel is bypassed in favor of the
    XLA path so the partitioner can slice it.

    Semantics are identical to `starro_em_bp` (same trace, sharded
    layout). Returns (scores, mask) as host arrays.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..configuration import config

    if mesh is None:
        from ..parallel.mesh import create_mesh

        mesh = getattr(config, "mesh", None) or create_mesh(axis_names=(mesh_axis,))
    X = np.asarray(X)
    kwargs.setdefault("mask_only", False)
    # reuse starro_em_bp's preprocessing by inlining its narrow-upload +
    # static-arg logic but device_put the raster with row sharding first
    if np.issubdtype(X.dtype, np.floating) and X.size and float(np.abs(X).max()) < 32767 and np.all(X == np.round(X)):
        X_up = X.astype(np.int16)
    elif np.issubdtype(X.dtype, np.integer) and (X.size == 0 or np.abs(X).max() < 32767):
        X_up = X.astype(np.int16)
    else:
        X_up = X
    k = kwargs.pop("k", 5)
    mk = kwargs.pop("mk", None) or k + 2
    downsample = kwargs.pop("downsample", 0.001)
    n = X.size
    n_samples = max(int(n * downsample), 1000) if downsample <= 1 else int(downsample)
    n_samples = min(n_samples, n)
    bp_k = kwargs.pop("bp_k", 3)
    bp_square = kwargs.pop("bp_square", False)
    neighborhood = np.ones((bp_k, bp_k)) if bp_square else circle(bp_k)
    offsets = tuple(map(tuple, create_neighbor_offsets(neighborhood.astype(bool)).tolist()))
    seed = kwargs.pop("seed", None)
    key = jax.random.PRNGKey(0 if seed is None else seed)
    mask_only = kwargs.pop("mask_only", False)

    spec = P(*([mesh_axis] + [None] * (X_up.ndim - 1)))
    X_dev = jax.device_put(jnp.asarray(X_up), NamedSharding(mesh, spec))
    with mesh:
        scores, mask = _starro_em_bp_fused(
            X_dev,
            key,
            k,
            mk,
            n_samples,
            kwargs.pop("em_max_iter", 2000),
            float(kwargs.pop("em_precision", 1e-6)),
            offsets,
            float(kwargs.pop("bp_p", 0.6)),
            float(kwargs.pop("bp_q", 0.4)),
            float(kwargs.pop("bp_precision", 1e-6)),
            int(kwargs.pop("bp_max_iter", 100)),
            False,  # Pallas BP bypassed: the XLA path is GSPMD-partitionable
            False,
        )
    return np.asarray(scores), np.asarray(mask)
