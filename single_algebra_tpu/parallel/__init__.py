"""Device-mesh parallelism: row-sharded operators and sharded PCA."""

from .sharded import ShardedDensified, ShardedSpMM, make_mesh  # noqa: F401
from .pca import ShardedPCAResult, sharded_pca_fit_transform  # noqa: F401
from .gram import ShardedGram, sharded_gram_pca  # noqa: F401
