"""Reference-named module alias (reference plotting/static/colorlabel.py) —
the categorical color-label helpers live in `geo`/`utils`."""

from .geo import color_label  # noqa: F401
from .utils import map2color  # noqa: F401
