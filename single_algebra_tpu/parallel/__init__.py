"""Device-mesh parallelism: row-sharded operators and sharded PCA."""

from .sharded import (  # noqa: F401
    ShardedDensified,
    ShardedSpMM,
    ShardedTiled,
    make_mesh,
)
from .pca import (  # noqa: F401
    ShardedPCAResult,
    choose_sharded_engine,
    sharded_pca_fit_transform,
)
from .gram import ShardedGram, sharded_gram_pca  # noqa: F401
