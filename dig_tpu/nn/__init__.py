from .init import glorot_orthogonal, xavier_uniform
from .blocks import MLP, ShiftedSoftplus, shifted_softplus, swish

__all__ = ["glorot_orthogonal", "xavier_uniform", "MLP",
           "ShiftedSoftplus", "shifted_softplus", "swish"]
