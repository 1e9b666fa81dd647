"""SVD engines over the operator seam (rebuild of single-svdlib's role)."""

from .operators import (  # noqa: F401
    CenteredOperator,
    DenseOperator,
    DensifiedOperator,
    MaskedOperator,
    TiledSparseOperator,
    SparseOperator,
)
from .svd import SvdResult, cholesky_qr2, randomized_svd, svd_flip  # noqa: F401
from .lanczos import lanczos_svd, default_lanczos_steps  # noqa: F401
from .block_lanczos import block_lanczos_svd  # noqa: F401
from .gram import (  # noqa: F401
    GramPCAEngine,
    gram_matrix,
    gram_pca_graph,
    topk_psd_eigh,
)
