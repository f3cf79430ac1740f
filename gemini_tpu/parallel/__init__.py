from .mesh import default_mesh, shard_vector
from .msm import msm_multichip
from .sumcheck import (
    round_message_sharded,
    fold_sharded,
    ShardedTimeProver,
)
