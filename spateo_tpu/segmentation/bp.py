"""Belief propagation (public module; compute in spateo_tpu.ops.bp).

Parity surface with reference spateo/segmentation/bp.py (which crosses into
the compiled C++ `fbgbp` extension at bp.py:74-92); here the message passing
is a fused XLA kernel.
"""

from ..ops.bp import cell_marginals, create_neighbor_offsets, run_bp

__all__ = ["cell_marginals", "create_neighbor_offsets", "run_bp"]
