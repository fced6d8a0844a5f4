from otamg.krylov.pcg import PCGResult, make_preconditioner, pcg, pcg_matrix  # noqa: F401
