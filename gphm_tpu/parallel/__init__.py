from gphm_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicated,
    shard_params_2d,
    sharded_train_step_2d,
)
