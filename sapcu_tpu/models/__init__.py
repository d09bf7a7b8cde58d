from sapcu_tpu.models.fd_model import (
    init_fd_model,
    fd_apply,
    fd_encoder_apply,
    fd_decoder_apply,
    fd_loss,
)
from sapcu_tpu.models.fn_model import (
    init_fn_model,
    fn_apply,
    fn_encoder_apply,
    fn_decoder_apply,
    fn_loss,
    normal_consistency_loss,
    angular_error_deg,
)
from sapcu_tpu.models.sc_model import (
    init_sc_model,
    sc_apply,
    sc_encode,
    sc_head,
    sc_loss,
)

__all__ = [
    "init_fd_model", "fd_apply", "fd_encoder_apply", "fd_decoder_apply",
    "fd_loss", "init_fn_model", "fn_apply", "fn_encoder_apply",
    "fn_decoder_apply", "fn_loss", "normal_consistency_loss",
    "angular_error_deg", "init_sc_model", "sc_apply", "sc_encode",
    "sc_head", "sc_loss",
]
