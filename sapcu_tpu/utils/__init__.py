from sapcu_tpu.utils.config import (
    load_config,
    update_recursive,
    set_default_config_values,
    get_model,
    effective_fd_training,
    setup_seed,
)
from sapcu_tpu.utils.checkpoint import CheckpointIO
from sapcu_tpu.utils.config import apply_platform_env

__all__ = [
    "load_config", "update_recursive", "set_default_config_values",
    "get_model", "effective_fd_training", "setup_seed", "CheckpointIO",
    "apply_platform_env",
]
