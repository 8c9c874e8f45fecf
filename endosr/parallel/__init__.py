from endosr.parallel.mesh import (
    get_mesh,
    make_mesh,
    replicate,
    shard_batch,
)

__all__ = ["make_mesh", "get_mesh", "shard_batch", "replicate"]
