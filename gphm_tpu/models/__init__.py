from gphm_tpu.models.base import TrainResult, chunked_train  # noqa: F401
from gphm_tpu.models.solver_1d import Solver1D  # noqa: F401
from gphm_tpu.models.solver_2d import Solver2D  # noqa: F401
from gphm_tpu.models.extra import Solver1DExtra  # noqa: F401
