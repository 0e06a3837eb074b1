from gsjax.parallel.multihost import is_primary, maybe_init_distributed  # noqa: F401
from gsjax.parallel.shard import (  # noqa: F401
    balance_band_bounds,
    dual_balance_bounds,
    equal_band_bounds,
    make_mesh,
    pair_bands,
    paired_balance_bounds,
    render_sharded,
    render_views_sharded,
    stack_cameras,
    train_step_sharded,
)
