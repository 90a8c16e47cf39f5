"""Moran's I pixel scoring on device (parity: reference spateo/segmentation/moran.py:19,57).

The z-score/p-value math is a handful of fused VPU reductions plus one conv —
the whole score map is computed in a single jitted call instead of
scipy.signal convolution + host stats.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configuration import SKM
from ..core.anndata import AnnData
from ..logging import logger_manager as lm
from ..ops.image import _conv2d_kernel, _reflect_pad, circle, gaussian_kernel_1d, mclose_mopen
from ..ops.threshold import threshold_otsu


def _moran_kernel_weights(k: int) -> np.ndarray:
    g = gaussian_kernel_1d(k)
    kernel = np.outer(g, g) * circle(k)
    kernel[(k - 1) // 2, (k - 1) // 2] = 0
    return kernel


@jax.jit
def _moran_stats(X: jnp.ndarray, kernel: jnp.ndarray, mask: jnp.ndarray):
    n = jnp.sum(mask)
    x_bar = jnp.sum(jnp.where(mask, X, 0.0)) / n
    z = X - x_bar
    zm = jnp.where(mask, z, 0.0)
    m2 = jnp.sum(zm**2) / n
    k = kernel.shape[0]
    c = _conv2d_kernel(_reflect_pad(z, (k - 1) // 2), kernel, k, k, "VALID")
    i = z / m2 * c
    ksum = jnp.sum(kernel)
    ei = -ksum / (n - 1)
    wi2 = jnp.sum(kernel**2)
    m4 = jnp.sum(zm**4) / n
    b2 = m4 / (m2**2)
    tow_wikh = ksum * ksum
    vari = wi2 * (n - b2) / (n - 1) + tow_wikh * (2 * b2 - n) / ((n - 1) * (n - 2)) - ksum**2 / (n - 1) ** 2
    zscore = (i - ei) / jnp.sqrt(vari)
    pvalue = 2.0 * jax.scipy.stats.norm.sf(jnp.abs(zscore))
    return z, c, i, pvalue


def moranI(
    X: np.ndarray, kernel: np.ndarray, mask: Optional[np.ndarray] = None
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-pixel Moran's I statistic, z-score and two-sided p-value."""
    Xd = jnp.asarray(np.asarray(X), jnp.float32)
    maskd = jnp.asarray(np.ones(Xd.shape, bool) if mask is None else np.asarray(mask).astype(bool))
    z, c, i, p = _moran_stats(Xd, jnp.asarray(kernel, jnp.float32), maskd)
    return np.asarray(z), np.asarray(c), np.asarray(i), np.asarray(p)


def run_moran(X: np.ndarray, k: int = 7, p_threshold: float = 0.05, mask: Optional[np.ndarray] = None) -> np.ndarray:
    """Moran's I score map: local spatial autocorrelation, zeroed where not
    significant (parity: reference moran.py:57)."""
    kernel = _moran_kernel_weights(k)
    z, c, i, pvalue = moranI(X, kernel, mask=mask)
    c = c.copy()
    c[pvalue >= p_threshold] = 0
    return c


@SKM.check_adata_is_type(SKM.ADATA_AGG_TYPE)
def run_moran_and_mask_pixels(
    adata: AnnData,
    layer: str,
    k: int = 7,
    p_threshold: float = 0.05,
    mk: int = 3,
    mask: Optional[np.ndarray] = None,
    mask_layer: Optional[str] = None,
):
    """Moran's I scoring followed by Otsu masking (capability parity:
    reference moran.py:85; the edge-watershed variant reduces to
    significance + magnitude thresholding here)."""
    X = SKM.select_layer_data(adata, layer, make_dense=True)
    kernel = _moran_kernel_weights(k)
    z, c, i, pvalue = moranI(X, kernel, mask=mask)
    sig = pvalue < p_threshold
    c_sig = np.where(sig, c, 0)
    pos = c_sig[c_sig > 0]
    cutoff = threshold_otsu(pos) if pos.size else 0.0
    m = sig & (c >= cutoff)
    if mask is not None:
        m &= mask.astype(bool)
    m = np.asarray(mclose_mopen(m, mk))
    out = mask_layer or SKM.gen_new_layer_key(layer, SKM.MASK_SUFFIX)
    SKM.set_layer_data(adata, out, m)


def binary_morani_result(
    c: np.ndarray,
    p: np.ndarray,
    pvalue_cutoff: Optional[float] = None,
    method: str = "edge-watershed",
    c_cutoff: Optional[float] = None,
    tissue_mask: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Cell mask from per-pixel Moran's I scores `c` and p-values `p`
    (parity: reference moran.py:129). Two significance modes: Otsu on the
    p-value histogram, or Sobel-edge watershed into fore/background; the
    final mask also requires the (0-255 scaled) Moran score to clear an Otsu
    threshold."""
    c = np.asarray(c, float)
    p = np.asarray(p, float)
    if pvalue_cutoff is None:
        if method == "otsu":
            p8 = (p * 255).astype(np.uint8)
            p2 = p8[tissue_mask > 0] if isinstance(tissue_mask, np.ndarray) else p8.ravel()
            pvalue_cutoff = threshold_otsu(p2.astype(np.float32))
            p_cell_mask = p8 <= pvalue_cutoff
        elif method == "edge-watershed":
            from ..ops.labels import _watershed_kernel, connected_components

            # sobel gradient magnitude of the p-value surface
            kx = np.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], np.float32) / 8
            import jax.numpy as _jnp

            gx = np.asarray(_conv2d_kernel(_reflect_pad(_jnp.asarray(p, _jnp.float32), 1), _jnp.asarray(kx), 3, 3, "VALID"))
            gy = np.asarray(_conv2d_kernel(_reflect_pad(_jnp.asarray(p, _jnp.float32), 1), _jnp.asarray(kx.T), 3, 3, "VALID"))
            edges = np.sqrt(gx**2 + gy**2)
            markers = np.zeros_like(p, np.int32)
            markers[p > 0.95] = 2  # background
            markers[p < 1e-5] = 1  # foreground
            ws = np.asarray(
                _watershed_kernel(
                    _jnp.asarray(edges, _jnp.float32),
                    _jnp.asarray(markers),
                    _jnp.ones_like(_jnp.asarray(p), bool),
                )
            )
            p_cell_mask = ws == 1
        else:
            raise ValueError(f"unknown method {method}; use 'otsu' or 'edge-watershed'")
    else:
        p_cell_mask = p <= pvalue_cutoff

    if c_cutoff is None:
        c8 = ((c - c.min()) / max(c.max() - c.min(), 1e-12) * 255).astype(np.uint8)
        sel = p_cell_mask & (tissue_mask > 0) if isinstance(tissue_mask, np.ndarray) else p_cell_mask
        vals = c8[sel]
        c_cutoff = threshold_otsu(vals.astype(np.float32)) if vals.size else 0.0
        c = c8
    mask = p_cell_mask & (c >= c_cutoff)
    if isinstance(tissue_mask, np.ndarray):
        mask &= tissue_mask > 0
    return mask.astype(bool)
