from gphm_tpu.problems.equations import (  # noqa: F401
    EQUATIONS_1D,
    EQUATIONS_2D,
    Problem1D,
    Problem2D,
    boundary_values_2d,
    make_problem,
    source_1d,
    source_2d,
)
