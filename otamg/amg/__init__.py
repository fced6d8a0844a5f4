from otamg.amg.graph import (  # noqa: F401
    connected_components_bipartite,
    mis_dense,
    strength_dense,
)
from otamg.amg.hierarchy import (  # noqa: F401
    AMGSolveResult,
    BipartiteLevel,
    CSRLevel,
    DenseLevel,
    amg_solve,
    amg_solve_matrix,
    bip_matvec,
    capacity_schedule,
    make_cycle,
    setup_hierarchy,
    setup_hierarchy_generic,
    setup_hierarchy_sparse,
)
