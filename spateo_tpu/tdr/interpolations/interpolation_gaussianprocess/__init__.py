"""GP model/training shims (capability parity: reference
tdr/interpolations/interpolation_gaussianprocess/{gp_models,gp_train}.py —
the gpytorch Exact/Approx models are realized by the jax SGPR in
interpolation_gp.py)."""

from .gp_models import Approx_GPModel, Exact_GPModel
from .gp_train import gp_train
