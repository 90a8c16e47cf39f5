"""Identify cell-occupied pixels ("Starro" stage 1).

Capability parity with reference spateo/segmentation/icell.py:
- `score_and_mask_pixels` (:319) — the main scoring driver with gauss / moran /
  EM[+gauss/BP] / VI[+gauss/BP] methods;
- `mask_cells_from_stain` (:61) / `mask_nuclei_from_stain` (:96);
- `_initial_nb_params` (:140), `_score_pixels` (:195).

Every raster stage (conv, EM, BP, thresholds, morphology) is a device kernel.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple, Union

import numpy as np
from scipy.sparse import issparse, spmatrix

from ..configuration import SKM
from ..core.anndata import AnnData
from ..errors import SegmentationError
from ..logging import logger_manager as lm
from ..ops.threshold import threshold_local, threshold_multiotsu, threshold_otsu
from . import bp, em, moran, utils, vi


def _mask_cells_from_stain(X: np.ndarray, otsu_classes: int = 3, otsu_index: int = 0, mk: int = 7) -> np.ndarray:
    """Multi-Otsu global threshold -> morphology (parity: icell.py:30)."""
    thresholds = threshold_multiotsu(X, classes=otsu_classes)
    return np.asarray(utils.mclose_mopen(X >= thresholds[otsu_index], mk))


def _mask_nuclei_from_stain(
    X: np.ndarray,
    otsu_classes: int = 3,
    otsu_index: int = 0,
    local_k: int = 55,
    offset: int = -5,
    mk: int = 5,
) -> np.ndarray:
    """Global multi-Otsu background + adaptive local foreground
    (parity: icell.py:45)."""
    thresholds = threshold_multiotsu(X, classes=otsu_classes)
    background_mask = X < thresholds[otsu_index]
    local_surface = np.asarray(threshold_local(X, local_k, method="gaussian", offset=offset))
    nuclei_mask = (np.asarray(X, float) > local_surface) & ~background_mask
    return np.asarray(utils.mclose_mopen(nuclei_mask, mk))


@SKM.check_adata_is_type(SKM.ADATA_AGG_TYPE)
def mask_cells_from_stain(
    adata: AnnData,
    otsu_classes: int = 3,
    otsu_index: int = 0,
    mk: int = 7,
    layer: str = SKM.STAIN_LAYER_KEY,
    out_layer: Optional[str] = None,
):
    """Boolean cell mask from a staining image (parity: icell.py:61)."""
    if layer not in adata.layers:
        raise SegmentationError(
            f'Layer "{layer}" does not exist in AnnData. '
            "Please import nuclei staining results either manually or "
            "with the `stain_path` argument to `st.io.read_bgi_agg`."
        )
    X = SKM.select_layer_data(adata, layer, make_dense=True)
    lm.main_info("Constructing cell mask from staining image.")
    mask = _mask_cells_from_stain(X, otsu_classes, otsu_index, mk)
    out_layer = out_layer or SKM.gen_new_layer_key(layer, SKM.MASK_SUFFIX)
    SKM.set_layer_data(adata, out_layer, mask)


@SKM.check_adata_is_type(SKM.ADATA_AGG_TYPE)
def mask_nuclei_from_stain(
    adata: AnnData,
    otsu_classes: int = 3,
    otsu_index: int = 0,
    local_k: int = 55,
    offset: int = 5,
    mk: int = 5,
    layer: str = SKM.STAIN_LAYER_KEY,
    out_layer: Optional[str] = None,
):
    """Boolean nuclei mask from a staining image (parity: icell.py:96)."""
    if layer not in adata.layers:
        raise SegmentationError(
            f'Layer "{layer}" does not exist in AnnData. '
            "Please import nuclei staining results either manually or "
            "with the `stain_path` argument to `st.io.read_bgi_agg`."
        )
    X = SKM.select_layer_data(adata, layer, make_dense=True)
    lm.main_info("Constructing nuclei mask from staining image.")
    mask = _mask_nuclei_from_stain(X, otsu_classes, otsu_index, local_k, -offset, mk)
    out_layer = out_layer or SKM.gen_new_layer_key(layer, SKM.MASK_SUFFIX)
    SKM.set_layer_data(adata, out_layer, mask)


def _initial_nb_params(
    X: np.ndarray, bins: Optional[np.ndarray] = None
) -> Union[Dict[str, Tuple[float, float]], Dict[int, Dict[str, Tuple[float, float]]]]:
    """Otsu-split initial estimates for the NB mixture (parity: icell.py:140)."""
    samples = {}
    if bins is not None:
        for label in np.unique(bins):
            if label > 0:
                samples[int(label)] = np.asarray(X)[bins == label]
    else:
        samples[0] = np.asarray(X).ravel()

    params = {}
    for label, _samples in samples.items():
        threshold = max(threshold_otsu(_samples), 1)
        mask = _samples > threshold
        background_values = _samples[~mask]
        foreground_values = _samples[mask]
        w = np.array([_samples.size - mask.sum(), mask.sum()]) / _samples.size
        mu = np.array([background_values.mean(), foreground_values.mean() if mask.any() else threshold * 2.0])
        var = np.array([background_values.var(), foreground_values.var() if mask.any() else threshold * 4.0])
        for i, name in ((0, "background"), (1, "foreground")):
            if var[i] <= mu[i]:
                lm.main_warning(
                    f"Bin {label} estimated variance of {name} ({var[i]:.2e}) is less than the mean ({mu[i]:.2e}). "
                    "Initial variance will be arbitrarily set to 1.1x of the mean."
                )
                var[i] = mu[i] * 1.1
        params[label] = dict(w=tuple(w), mu=tuple(mu), var=tuple(var))
    return params[0] if bins is None else params


def _score_pixels(
    X: Union[spmatrix, np.ndarray],
    k: int,
    method: str,
    moran_kwargs: Optional[dict] = None,
    em_kwargs: Optional[dict] = None,
    vi_kwargs: Optional[dict] = None,
    bp_kwargs: Optional[dict] = None,
    certain_mask: Optional[np.ndarray] = None,
    bins: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Score each pixel's likelihood of being a cell in [0, 1]
    (parity: reference icell.py:195)."""
    if method.lower() not in ("gauss", "moran", "em", "em+gauss", "em+bp", "vi+gauss", "vi+bp"):
        raise SegmentationError(f"Unknown method `{method}`")
    if certain_mask is not None and X.shape != certain_mask.shape:
        raise SegmentationError("`certain_mask` does not have the same shape as `X`")
    if bins is not None and X.shape != bins.shape:
        raise SegmentationError("`bins` does not have the same shape as `X`")

    method = method.lower()
    moran_kwargs = moran_kwargs or {}
    em_kwargs = em_kwargs or {}
    vi_kwargs = vi_kwargs or {}
    bp_kwargs = bp_kwargs or {}
    if moran_kwargs and "moran" not in method:
        lm.main_warning("`moran_kwargs` will be ignored.")
    if em_kwargs and "em" not in method:
        lm.main_warning("`em_kwargs` will be ignored.")
    if vi_kwargs and "vi" not in method:
        lm.main_warning("`vi_kwargs` will be ignored.")
    if bp_kwargs and "bp" not in method:
        lm.main_warning("`bp_kwargs` will be ignored.")

    if issparse(X):
        X = X.toarray()
    X = np.asarray(X, dtype=float)

    res = np.asarray(utils.conv2d(X, k, mode="gauss" if method in ("gauss", "moran") else "circle", bins=bins))

    if method == "gauss":
        res = np.asarray(utils.scale_to_01(res))
    elif method == "moran":
        res = moran.run_moran(res, mask=None if bins is None else bins > 0, **moran_kwargs)
        res /= res.max()
    else:
        nb_kwargs = dict(params=_initial_nb_params(res, bins=bins))
        if "em" in method:
            nb_kwargs.update(em_kwargs)
            em_results = em.run_em(res, bins=bins, **nb_kwargs)
            conditional_func = partial(em.conditionals, em_results=em_results, bins=bins)
        else:
            nb_kwargs.update(vi_kwargs)
            vi_results = vi.run_vi(res, bins=bins, **nb_kwargs)
            conditional_func = partial(vi.conditionals, vi_results=vi_results, bins=bins)

        if "bp" in method:
            background_cond, cell_cond = conditional_func(res)
            if certain_mask is not None:
                background_cond = np.where(certain_mask, 1e-2, background_cond)
                cell_cond = np.where(certain_mask, 1 - 1e-2, cell_cond)
            res = bp.run_bp(background_cond, cell_cond, **bp_kwargs)
        else:
            res = em.confidence(res, em_results=em_results, bins=bins)
            if certain_mask is not None:
                res = np.clip(res + certain_mask, 0, 1)

        if "gauss" in method:
            res = np.asarray(utils.conv2d(res, k, mode="gauss", bins=bins))
    return np.asarray(res)


@SKM.check_adata_is_type(SKM.ADATA_AGG_TYPE)
def score_and_mask_pixels(
    adata: AnnData,
    layer: str,
    k: int,
    method: str,
    moran_kwargs: Optional[dict] = None,
    em_kwargs: Optional[dict] = None,
    vi_kwargs: Optional[dict] = None,
    bp_kwargs: Optional[dict] = None,
    threshold: Optional[float] = None,
    use_knee: Optional[bool] = False,
    mk: Optional[int] = None,
    bins_layer: Optional[Union[bool, str]] = None,
    certain_layer: Optional[str] = None,
    scores_layer: Optional[str] = None,
    mask_layer: Optional[str] = None,
    mesh=None,
):
    """Score and mask pixels by how likely they are occupied by a cell
    (parity: reference icell.py:319).

    ``mesh``: optional `jax.sharding.Mesh` — the EM+BP fused program runs
    sharded, raster rows split over the mesh's 'data' axis (conv/BP shifts
    become ICI halo exchanges under GSPMD; see `starro_em_bp_sharded`).
    Only the fused EM+BP fast path shards; other methods ignore it."""
    X = SKM.select_layer_data(adata, layer, make_dense=True)
    certain_mask = None
    if certain_layer:
        certain_mask = np.asarray(SKM.select_layer_data(adata, certain_layer)).astype(bool)
    bins = None
    if bins_layer is not False:
        bins_layer = bins_layer or SKM.gen_new_layer_key(layer, SKM.BINS_SUFFIX)
        if bins_layer in adata.layers:
            bins = np.asarray(SKM.select_layer_data(adata, bins_layer))
    method = method.lower()
    lm.main_info(f"Scoring pixels with {method} method.")

    # fast path: the whole EM+BP scoring + threshold + morphology pipeline as
    # one fused device program (no per-stage host round-trips). Falls back to
    # the staged path whenever bins / certain masks / custom thresholds are in
    # play.
    if (
        method == "em+bp"
        and bins is None
        and certain_mask is None
        and threshold is None
        and not use_knee
        and not (moran_kwargs or vi_kwargs)
    ):
        from .starro import starro_em_bp

        fused_kwargs = {}
        for src, dst in (("downsample", "downsample"), ("max_iter", "em_max_iter"), ("precision", "em_precision"), ("seed", "seed")):
            if src in (em_kwargs or {}):
                fused_kwargs[dst] = em_kwargs[src]
        for src, dst in (("k", "bp_k"), ("square", "bp_square"), ("p", "bp_p"), ("q", "bp_q"), ("precision", "bp_precision"), ("max_iter", "bp_max_iter")):
            if src in (bp_kwargs or {}):
                fused_kwargs[dst] = bp_kwargs[src]
        if issparse(X):
            X = X.toarray()
        if mesh is not None:
            from .starro import starro_em_bp_sharded

            scores_d, mask_d = starro_em_bp_sharded(np.asarray(X, dtype=float), mesh=mesh, k=k, mk=mk or k + 2, **fused_kwargs)
        else:
            scores_d, mask_d = starro_em_bp(np.asarray(X, dtype=float), k=k, mk=mk or k + 2, **fused_kwargs)
        scores = np.asarray(scores_d)
        SKM.set_layer_data(adata, scores_layer or SKM.gen_new_layer_key(layer, SKM.SCORES_SUFFIX), scores)
        SKM.set_layer_data(adata, mask_layer or SKM.gen_new_layer_key(layer, SKM.MASK_SUFFIX), np.asarray(mask_d))
        return

    scores = _score_pixels(X, k, method, moran_kwargs, em_kwargs, vi_kwargs, bp_kwargs, certain_mask, bins)
    scores_layer = scores_layer or SKM.gen_new_layer_key(layer, SKM.SCORES_SUFFIX)
    SKM.set_layer_data(adata, scores_layer, scores)

    if not threshold and not use_knee:
        threshold = threshold_otsu(scores)
        lm.main_info(f"Applying threshold {threshold}.")
    mk = mk or (k + 2 if any(m in method for m in ("em", "vi")) else max(k - 2, 3))
    if use_knee:
        threshold = None
    mask = utils.apply_threshold(scores, mk, threshold)
    if certain_layer:
        mask = mask | certain_mask
    mask_layer = mask_layer or SKM.gen_new_layer_key(layer, SKM.MASK_SUFFIX)
    SKM.set_layer_data(adata, mask_layer, mask)
