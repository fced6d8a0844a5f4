from otamg.ot import operators, problems  # noqa: F401
from otamg.ot.problems import (  # noqa: F401
    Class1Problem,
    Class2Problem,
    load_class1_mat,
    load_class2_mat,
    assignment_problem,
    capacitated_problem,
    random_class1,
    random_class2,
)
