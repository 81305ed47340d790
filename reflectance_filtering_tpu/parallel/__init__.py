from .mesh import (  # noqa: F401
    make_mesh, replicate, shard_batch, shard_batch_multihost,
    make_sharded_eval, make_sharded_train_step,
)
from .spatial import sharded_box_filter, sharded_joint_bilateral  # noqa: F401
