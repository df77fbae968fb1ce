from .cdf import (
    MIXIN1,
    mixin_table,
    cdf_initial,
    cdf_update,
    cdf_lookup,
    cdf_cost,
    new_cdf,
)
from .lz_model import LZModel, RepState

__all__ = [
    "MIXIN1",
    "mixin_table",
    "cdf_initial",
    "cdf_update",
    "cdf_lookup",
    "cdf_cost",
    "new_cdf",
    "LZModel",
    "RepState",
]
