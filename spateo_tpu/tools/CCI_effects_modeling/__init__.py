"""MuSIC: CCI effects modeling by spatially-weighted regression
(parity: reference spateo/tools/CCI_effects_modeling/__init__.py)."""

from .distributions import Binomial, Gamma, Gaussian, NegativeBinomial, Poisson
from .MuSIC import MuSIC
from .MuSIC_downstream import MuSIC_Interpreter
from .MuSIC_upstream import MuSIC_Molecule_Selector
from .regression_utils import (
    compute_betas,
    compute_betas_local,
    iwls,
    iwls_batch,
    multitesting_correction,
    wald_test,
)
from .SWR import define_spateo_argparse
