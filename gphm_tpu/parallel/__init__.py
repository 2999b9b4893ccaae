from gphm_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    mesh_from_spec,
    replicated,
    shard_params_2d,
    sharded_train_step_2d,
    state_placer,
)
from gphm_tpu.parallel.sweep import run_sweep, sweep_variants  # noqa: F401
