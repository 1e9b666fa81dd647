"""Sparse containers and host-side format conversion."""

from .matrix import SparseMatrix, csr_matrix, csc_matrix, random_sparse  # noqa: F401
from . import convert  # noqa: F401
