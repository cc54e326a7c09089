"""Device-mesh parallelism utilities (pjit shardings over ICI)."""

from interdiff_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from interdiff_tpu.parallel.sample_parallel import (  # noqa: F401
    best_of_n_metrics,
    tile_for_diverse_samples,
)
