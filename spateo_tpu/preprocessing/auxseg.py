"""Auxiliary segmentation: live-wire tracing for manual boundary drawing
(parity: reference spateo/preprocessing/auxseg.py:8 — a copy of the
tools/live_wire implementation; here re-exported from the single source)."""

from ..tools.live_wire import LiveWireSegmentation, compute_shortest_path

__all__ = ["LiveWireSegmentation", "compute_shortest_path"]
