from otamg.opt.admm import warmup_class1, warmup_class2  # noqa: F401
from otamg.opt.apd import SolveResult, make_class1_step, solve_class1  # noqa: F401
from otamg.opt.newton import NewtonSolveResult, make_pcg_solver  # noqa: F401
