from otamg.opt.admm import warmup_class1, warmup_class2  # noqa: F401
from otamg.opt.apd import (SolveResult, make_class1_step,  # noqa: F401
                           solve_class1, solve_class1_chunked,
                           solve_class1_fused)
from otamg.opt.apd2 import (Solve2Result, make_class2_step,  # noqa: F401
                            solve_class2, solve_class2_chunked,
                            solve_class2_fused)
from otamg.opt.newton import NewtonSolveResult, make_pcg_solver  # noqa: F401
