from otamg.dist.api import (  # noqa: F401
    init_multihost,
    make_mesh,
    plan_sharding,
    replicated,
    row_sharding,
    shard_class1,
    shard_class2,
)
from otamg.dist.assembly import (  # noqa: F401
    asat_diags_sharded,
    galerkin_sharded,
    spgemm_rowsharded,
    transform_sharded,
)
from otamg.dist.spmv import spmv_allgather, spmv_halo  # noqa: F401
