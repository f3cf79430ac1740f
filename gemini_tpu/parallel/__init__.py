from .mesh import default_mesh, shard_vector
from .sumcheck import (
    round_message_sharded,
    fold_sharded,
    ShardedTimeProver,
)
