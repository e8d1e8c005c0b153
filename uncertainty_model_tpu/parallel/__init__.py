from .mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    replicate_tree,
    replicated,
    shard_batch,
)
