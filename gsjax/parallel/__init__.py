from gsjax.parallel.multihost import is_primary, maybe_init_distributed  # noqa: F401
from gsjax.parallel.shard import make_mesh, render_sharded, train_step_sharded  # noqa: F401
