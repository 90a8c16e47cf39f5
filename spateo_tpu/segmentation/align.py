"""Stain <-> RNA registration refinement by gradient descent on device.

Capability parity with reference spateo/segmentation/align.py:22-232, which
optimizes an affine (`RigidAlignmentRefiner`) or thin-plate-spline-mesh
(`NonRigidAlignmentRefiner`) warp with torch autograd + `F.grid_sample`.
Here the same objective (MSE between the warped stain and the RNA raster)
is optimized with jax.grad + optax Adam; bilinear warping is
`jax.scipy.ndimage.map_coordinates` inside jit.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Union

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..configuration import SKM
from ..core.anndata import AnnData
from ..errors import SegmentationError
from ..logging import logger_manager as lm
from . import utils


@partial(jax.jit, static_argnames=())
def _affine_warp(image: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Warp `image` with a 2x3 affine in normalized [-1, 1] coordinates
    (torch `affine_grid`/`grid_sample` semantics, align_corners=False)."""
    H, W = image.shape
    ys = (jnp.arange(H) + 0.5) / H * 2 - 1
    xs = (jnp.arange(W) + 0.5) / W * 2 - 1
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    # torch convention: grid holds (x, y) pairs; theta maps output->input
    sx = theta[0, 0] * gx + theta[0, 1] * gy + theta[0, 2]
    sy = theta[1, 0] * gx + theta[1, 1] * gy + theta[1, 2]
    iy = (sy + 1) / 2 * H - 0.5
    ix = (sx + 1) / 2 * W - 0.5
    return jax.scipy.ndimage.map_coordinates(image, [iy, ix], order=1, mode="constant", cval=0.0)


@jax.jit
def _displacement_warp(image: jnp.ndarray, disp_y: jnp.ndarray, disp_x: jnp.ndarray) -> jnp.ndarray:
    """Warp by a dense (H, W) displacement field in normalized units."""
    H, W = image.shape
    gy, gx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij")
    iy = gy + disp_y * H / 2
    ix = gx + disp_x * W / 2
    return jax.scipy.ndimage.map_coordinates(image, [iy, ix], order=1, mode="constant", cval=0.0)


def _upsample_bilinear(grid: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """Bilinear upsample an (h, w) control grid to (H, W)."""
    h, w = grid.shape
    iy = jnp.linspace(0, h - 1, H)
    ix = jnp.linspace(0, w - 1, W)
    gy, gx = jnp.meshgrid(iy, ix, indexing="ij")
    return jax.scipy.ndimage.map_coordinates(grid, [gy, gx], order=1, mode="nearest")


class AlignmentRefiner:
    """Base: optimize warp parameters to map `to_align` onto `reference`."""

    def __init__(self, reference: np.ndarray, to_align: np.ndarray):
        self.reference = jnp.asarray(utils.scale_to_01(reference))
        self.to_align = jnp.asarray(utils.scale_to_01(to_align))
        self._params = self._init_params()
        self.losses: List[float] = []

    def _init_params(self):
        raise NotImplementedError

    def _warp(self, image, params):
        raise NotImplementedError

    def train(self, n_epochs: int = 100, lr: float = 0.1):
        """Run the full optimization as ONE jitted lax.scan — a single device
        dispatch instead of n_epochs host round-trips."""
        opt = optax.adam(lr)

        @partial(jax.jit, static_argnames=("n",))
        def fit(params, reference, to_align, n):
            def loss_fn(params):
                pred = self._warp(to_align, params)
                return jnp.mean((pred - reference) ** 2)

            def step(carry, _):
                params, state = carry
                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, state = opt.update(grads, state)
                params = optax.apply_updates(params, updates)
                return (params, state), loss

            (params, _), losses = jax.lax.scan(step, (params, opt.init(params)), None, length=n)
            return params, losses

        params, losses = fit(self._params, self.reference, self.to_align, n_epochs)
        self.losses.extend(np.asarray(losses).tolist())
        self._params = params

    def get_params(self) -> dict:
        return {k: np.asarray(v) for k, v in self._params.items()}


class RigidAlignmentRefiner(AlignmentRefiner):
    """Affine refinement (parity: reference align.py:115)."""

    def __init__(self, reference: np.ndarray, to_align: np.ndarray, theta: Optional[np.ndarray] = None):
        self._theta0 = theta
        super().__init__(reference, to_align)

    def _init_params(self):
        theta = self._theta0 if self._theta0 is not None else np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        return {"theta": jnp.asarray(theta, jnp.float32)}

    def _warp(self, image, params):
        return _affine_warp(image, params["theta"])

    @staticmethod
    def transform(x, params, train: bool = False):
        theta = jnp.asarray(params["theta"], jnp.float32)
        out = _affine_warp(jnp.asarray(np.asarray(x), jnp.float32), theta)
        return np.asarray(out)


class NonRigidAlignmentRefiner(AlignmentRefiner):
    """Control-mesh (B-spline-like) displacement refinement
    (parity: reference align.py:68)."""

    def __init__(self, reference: np.ndarray, to_align: np.ndarray, binsize: Optional[int] = None, meshsize: Optional[int] = None):
        self._binsize = binsize or meshsize or 1000
        self._shape = reference.shape
        super().__init__(reference, to_align)

    def _init_params(self):
        H, W = self._shape
        h = max(2, int(np.ceil(H / self._binsize)) + 1)
        w = max(2, int(np.ceil(W / self._binsize)) + 1)
        return {
            "disp_y": jnp.zeros((h, w), jnp.float32),
            "disp_x": jnp.zeros((h, w), jnp.float32),
        }

    def _warp(self, image, params):
        H, W = image.shape
        dy = _upsample_bilinear(params["disp_y"], H, W)
        dx = _upsample_bilinear(params["disp_x"], H, W)
        return _displacement_warp(image, dy, dx)

    @staticmethod
    def transform(x, params, train: bool = False):
        x = jnp.asarray(np.asarray(x), jnp.float32)
        H, W = x.shape
        dy = _upsample_bilinear(jnp.asarray(params["disp_y"], jnp.float32), H, W)
        dx = _upsample_bilinear(jnp.asarray(params["disp_x"], jnp.float32), H, W)
        return np.asarray(_displacement_warp(x, dy, dx))


MODULES = {"rigid": RigidAlignmentRefiner, "non-rigid": NonRigidAlignmentRefiner}


@SKM.check_adata_is_type(SKM.ADATA_AGG_TYPE)
def refine_alignment(
    adata: AnnData,
    stain_layer: str = SKM.STAIN_LAYER_KEY,
    rna_layer: str = SKM.UNSPLICED_LAYER_KEY,
    mode: str = "rigid",
    downscale: float = 1,
    k: int = 5,
    n_epochs: int = 100,
    transform_layers: Optional[Union[str, List[str]]] = None,
    **kwargs,
):
    """Refine stain <-> RNA registration (parity: reference align.py:159)."""
    if mode not in MODULES:
        raise SegmentationError('`mode` must be one of "rigid" and "non-rigid"')
    if adata.shape[0] * downscale > 10000 or adata.shape[1] * downscale > 10000:
        lm.main_warning("Input has dimension > 10000. Consider downscaling using the `downscale` option.")

    stain = np.asarray(SKM.select_layer_data(adata, stain_layer, make_dense=True), dtype=float)
    rna = np.asarray(SKM.select_layer_data(adata, rna_layer, make_dense=True), dtype=float)
    if k > 1 and rna.dtype != np.dtype(bool):
        rna = np.asarray(utils.conv2d(rna, k, mode="gauss"))
    if downscale < 1:
        stain = cv2.resize(stain, (0, 0), fx=downscale, fy=downscale)
        rna = cv2.resize(rna, (0, 0), fx=downscale, fy=downscale)

    lm.main_info(f"Refining alignment in {mode} mode.")
    module = MODULES[mode]
    aligner = module(rna, stain, **kwargs)
    aligner.train(n_epochs)
    params = aligner.get_params()
    SKM.set_uns_spatial_attribute(adata, SKM.UNS_SPATIAL_ALIGNMENT_KEY, params)

    if transform_layers:
        if isinstance(transform_layers, str):
            transform_layers = [transform_layers]
        for layer in transform_layers:
            data = SKM.select_layer_data(adata, layer, make_dense=True)
            transformed = module.transform(data, params)
            if np.asarray(data).dtype == np.dtype(bool):
                transformed = transformed > 0.5
            SKM.set_layer_data(adata, layer, transformed.astype(np.asarray(data).dtype))
