"""Reference-named package alias (reference plotting/static/) — every
static plotting module lives flat under `spateo_tpu.plotting`."""

from .. import agg, align, bbs, contour, dotplot, geo, glm, interactions, lisa, networks, polarity, scatters, space  # noqa: F401
from .. import three_d_plot  # noqa: F401
