"""Host<->device bridge: AnnData layers to device-resident jnp buffers.

The reference keeps everything as host numpy/scipy and crosses into native
code per-call (cv2, fbgbp, torch uploads — SURVEY.md §2.11). The TPU-native
design instead moves data to HBM once with an explicit sharding and keeps the
whole pipeline on device. Sparse CSR layers transfer as (data, indices,
indptr) triplets and are materialized into padded dense blocks *on device*
via segment-sum scatter — the host never densifies the full matrix
("zero-copy sparse aggregation", BASELINE.json north star).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import sparse

from ..parallel.mesh import pad_to_multiple


def to_device(x, dtype=None, sharding=None):
    """Move a host array to device (optionally sharded)."""
    x = np.asarray(x)
    if dtype is not None:
        x = x.astype(dtype)
    return jax.device_put(x, sharding) if sharding is not None else jnp.asarray(x)


def csr_to_dense_device(
    mat: sparse.spmatrix,
    dtype=jnp.float32,
    pad_rows_to: int = 1,
    pad_cols_to: int = 1,
) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """CSR -> padded dense device array via on-device scatter-add.

    Only the nnz triplet crosses PCIe; densification happens in HBM. Returns
    (dense[padded_R, padded_C], (R, C)).
    """
    mat = mat.tocoo()
    R, C = mat.shape
    Rp = pad_to_multiple(max(R, 1), pad_rows_to)
    Cp = pad_to_multiple(max(C, 1), pad_cols_to)
    flat_idx = jnp.asarray(mat.row.astype(np.int32)) * Cp + jnp.asarray(mat.col.astype(np.int32))
    data = jnp.asarray(mat.data).astype(dtype)

    @jax.jit
    def scatter(flat_idx, data):
        dense = jnp.zeros((Rp * Cp,), dtype=dtype)
        dense = dense.at[flat_idx].add(data)
        return dense.reshape(Rp, Cp)

    return scatter(flat_idx, data), (R, C)


def layer_to_device(
    adata,
    layer: Optional[str] = None,
    dtype=jnp.float32,
    pad_rows_to: int = 1,
    pad_cols_to: int = 1,
) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """Fetch an AnnData layer as a padded dense device array."""
    from ..configuration import SKM

    X = SKM.select_layer_data(adata, layer)
    if sparse.issparse(X):
        return csr_to_dense_device(X, dtype, pad_rows_to, pad_cols_to)
    X = np.asarray(X)
    R, C = X.shape
    Rp = pad_to_multiple(max(R, 1), pad_rows_to)
    Cp = pad_to_multiple(max(C, 1), pad_cols_to)
    out = jnp.zeros((Rp, Cp), dtype=dtype).at[:R, :C].set(jnp.asarray(X, dtype=dtype))
    return out, (R, C)


def segment_sum_device(values, segment_ids, num_segments: int):
    """On-device unsorted segment sum (label aggregation workhorse)."""
    values = jnp.asarray(values)
    segment_ids = jnp.asarray(segment_ids)

    @jax.jit
    def run(values, segment_ids):
        return jax.ops.segment_sum(values, segment_ids, num_segments=num_segments)

    return run(values, segment_ids)


def points_to_raster(
    x: np.ndarray,
    y: np.ndarray,
    counts: np.ndarray,
    shape: Tuple[int, int],
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Scatter (x, y, count) point reads into a dense [H, W] raster on device.

    TPU-native replacement for the reference's host-side
    `scipy.sparse.csr_matrix((count, (x, y)))` construction (reference
    spateo/io/bgi.py:186-213): a single fused scatter-add on HBM.
    """
    H, W = shape
    flat = jnp.asarray(x.astype(np.int32)) * W + jnp.asarray(y.astype(np.int32))
    vals = jnp.asarray(counts).astype(dtype)

    @jax.jit
    def scatter(flat, vals):
        return jnp.zeros((H * W,), dtype=dtype).at[flat].add(vals).reshape(H, W)

    return scatter(flat, vals)
