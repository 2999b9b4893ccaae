from gphm_tpu.ops.kernels import (  # noqa: F401
    KERNELS,
    Matern52,
    Matern52Cos,
    SE,
    SECos,
    StationaryKernel,
    get_kernel,
    init_mixture_params,
)
from gphm_tpu.ops.gram import cross_gram, gram  # noqa: F401
from gphm_tpu.ops.chol import (  # noqa: F401
    SPDFactor,
    robust_cholesky,
    spd_factor,
)
from gphm_tpu.ops.kron import KronOperator  # noqa: F401
from gphm_tpu.ops.cg import cg_solve  # noqa: F401
