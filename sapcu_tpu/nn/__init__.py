from sapcu_tpu.nn.layers import (
    dense_init,
    dense,
    bn_init,
    bn_apply,
    layer_norm_init,
    layer_norm,
    gelu,
    leaky_relu,
    softplus_beta,
    dropout,
    l2_normalize,
)

__all__ = [
    "dense_init", "dense", "bn_init", "bn_apply", "layer_norm_init",
    "layer_norm", "gelu", "leaky_relu", "softplus_beta", "dropout",
    "l2_normalize",
]
