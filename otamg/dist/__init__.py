from otamg.dist.api import (  # noqa: F401
    make_mesh,
    plan_sharding,
    replicated,
    row_sharding,
    shard_class1,
    shard_class2,
)
from otamg.dist.spmv import spmv_allgather, spmv_halo  # noqa: F401
