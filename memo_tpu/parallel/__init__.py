"""Multi-device / multi-host execution (SPMD over a jax.sharding.Mesh)."""

from memo_tpu.parallel.sharded import (  # noqa: F401
    ShardedQuery,
    make_mesh,
    conservation_batch,
    membership_batch,
)
from memo_tpu.parallel.resident import ResidentShardedQuery  # noqa: F401
from memo_tpu.parallel.distributed import initialize, make_global_mesh  # noqa: F401
