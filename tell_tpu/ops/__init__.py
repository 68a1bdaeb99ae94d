from .common import dropout, layer_norm, init_layer_norm
from .linear import (
    init_linear,
    init_gehring_linear,
    linear,
    gehring_linear,
)
from .positional import sinusoidal_table, make_positions, sinusoidal_embed
from .dynamic_conv import (
    init_dynamic_conv,
    dynamic_conv,
    dynamic_conv_step,
    init_conv_state,
    init_lightweight_conv,
    lightweight_conv,
    lightweight_conv_step,
)
from .attention import (
    init_cross_attention,
    cross_attention,
    precompute_kv,
    cross_attention_with_kv,
)
from .adaptive import (
    init_adaptive_embedding,
    adaptive_embed,
    init_adaptive_softmax,
    adaptive_softmax_loss,
    adaptive_log_probs,
)
