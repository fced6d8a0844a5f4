from otamg.hybrid.solver import (  # noqa: F401
    make_aug_pcg_solver,
    make_direct_solver,
    make_hybrid_amg_solver,
)
