from gphm_tpu.utils.config import RunConfig, load_config  # noqa: F401
from gphm_tpu.utils.checkpoint import (  # noqa: F401
    load_checkpoint,
    run_dir,
    save_checkpoint,
)
from gphm_tpu.utils.logging import MetricsLogger, append_text_log  # noqa: F401
