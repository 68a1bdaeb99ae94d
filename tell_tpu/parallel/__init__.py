from .mesh import (batch_sharding, make_mesh, param_sharding_rules,
                   shard_params)
from .multihost import (barrier, global_any, init_multihost, is_primary,
                        place_global_batch)
from .ring import roberta_encode_ring
from .sequence import roberta_encode_seq_parallel
