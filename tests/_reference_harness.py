"""Import harness for golden-parity tests against the reference package.

The reference at /root/reference is CPU NumPy/SciPy/torch code with many
optional heavy dependencies that are absent in this image (anndata, skimage,
kornia, pyro, ...). For the pure-NumPy numeric kernels we want to pin parity
against, none of those dependencies are exercised at call time — they are
only imported at module top level. This harness installs a meta-path finder
that synthesizes empty stub modules for the known-absent packages so the
reference modules can be imported, then the tests call only functions whose
runtime dependencies (numpy/scipy/cv2) are real.

Tests using this harness must be tolerant to it being unavailable (the
reference tree is not shipped with this repo): use `reference_module()` and
skip when it returns None.
"""

import importlib
import importlib.abc
import importlib.machinery
import os
import sys
import types
import unittest.mock as mock

REFERENCE_ROOT = "/root/reference"

# Top-level packages the reference imports but this image does not ship.
# Real packages (numpy/scipy/cv2/sklearn/networkx/torch/joblib/tqdm) are NOT
# listed — reference code paths we test run on the real ones.
_FAKE_TOPS = {
    "kornia", "shapely", "skimage", "kneed", "session_info", "colorcet",
    "matplotlib_scalebar", "pyvista", "patsy", "fbgbp", "ot", "pynndescent",
    "umap", "igraph", "leidenalg", "louvain", "geopandas", "pysal",
    "libpysal", "esda", "spaghetti", "dynamo", "openpyxl", "nudged",
    "ngs_tools", "statsmodels", "numba", "torchvision", "plotly",
    "seaborn_image", "pymeshfix", "tensorflow", "SimpleITK", "csbdeep",
    "adjustText", "gpytorch", "stardist", "cellpose", "nptyping", "trimesh",
    "pacmap", "pygam", "scanpy", "squidpy", "dask", "pyro", "biotite",
    "descartes", "harmonypy", "loess", "POT", "spreg", "vtk", "pyacvd",
    "meshio", "tetgen", "mpl_point_clicker", "typing_extensions_ext",
}


class _FakeLoader(importlib.abc.Loader):
    def create_module(self, spec):
        m = types.ModuleType(spec.name)
        m.__getattr__ = lambda attr, _n=spec.name: mock.MagicMock(name=f"{_n}.{attr}")
        m.__path__ = []
        return m

    def exec_module(self, module):
        pass


class _FakeFinder(importlib.abc.MetaPathFinder):
    def find_spec(self, fullname, path=None, target=None):
        if fullname.split(".")[0] in _FAKE_TOPS:
            return importlib.machinery.ModuleSpec(fullname, _FakeLoader(), is_package=True)
        return None


_installed = False


def _install():
    global _installed
    if _installed:
        return
    sys.meta_path.append(_FakeFinder())
    if "anndata" not in sys.modules:
        import spateo_tpu.core as core

        anndata = types.ModuleType("anndata")
        anndata.AnnData = core.AnnData
        anndata.__getattr__ = lambda attr: mock.MagicMock(name=f"anndata.{attr}")
        anndata.__path__ = []
        sys.modules["anndata"] = anndata
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    _installed = True


def reference_module(name):
    """Import `name` (e.g. "spateo.segmentation.em") from the reference tree.

    Returns None when the reference tree is unavailable or the module cannot
    be imported in this image.
    """
    if not os.path.isdir(os.path.join(REFERENCE_ROOT, "spateo")):
        return None
    _install()
    try:
        return importlib.import_module(name)
    except Exception:
        return None
