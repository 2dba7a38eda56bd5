"""Interior-point algorithms (HSD, MPC) as jitted device code."""

from .data import LPData, lp_data_from_problem
from .point import Point, Residuals
from .hsd import HSDOptions, hsd_solve

__all__ = [
    "LPData",
    "lp_data_from_problem",
    "Point",
    "Residuals",
    "HSDOptions",
    "hsd_solve",
]
