"""NB-mixture EM (public module; compute in spateo_tpu.ops.em).

Parity surface with reference spateo/segmentation/em.py: nbn_em, run_em,
conditionals, confidence + parameterization converters.
"""

from ..ops.em import (
    conditionals,
    confidence,
    lamtheta_to_muvar,
    lamtheta_to_r,
    muvar_to_lamtheta,
    nb_logpmf,
    nbn_em,
    nbn_pmf,
    run_em,
)

__all__ = [
    "conditionals",
    "confidence",
    "lamtheta_to_muvar",
    "lamtheta_to_r",
    "muvar_to_lamtheta",
    "nb_logpmf",
    "nbn_em",
    "nbn_pmf",
    "run_em",
]
