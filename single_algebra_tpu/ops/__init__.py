"""Compute kernels: statistics, SpMM, preprocessing (XLA + Pallas)."""

from . import stats  # noqa: F401
from .spmm import ell_spmm, ell_spmm_xla  # noqa: F401
