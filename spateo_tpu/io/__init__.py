"""IO layer (`st.io`) — platform readers and binning utilities.

Capability parity with reference spateo/io/__init__.py (readers for BGI
Stereo-seq, MERFISH, NanoString CosMx, seqFISH, Seq-Scope, Slide-seq, STARmap,
10x Visium, plus binning and hull utilities).
"""

from . import image_utils, nanostring, slideseq, tenx
from .bbs import alpha_shape, get_concave_hull
from .bgi import read_bgi, read_bgi_agg, read_bgi_as_dataframe
from .image import add_image_layer, read_image
from .platforms import (
    read_10x,
    read_10x_as_anndata,
    read_merfish,
    read_nanostring,
    read_seqfish,
    read_seqscope,
    read_slideseq,
    read_starmap,
    stitch_images,
)
from .utils import (
    bin_indices,
    bin_matrix,
    centroids,
    get_bin_props,
    get_coords_labels,
    get_label_props,
    get_points_props,
    in_concave_hull,
    in_convex_hull,
)
