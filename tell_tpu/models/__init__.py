from .decoder import (
    init_decoder,
    decoder_forward,
    init_decode_state,
    decoder_step,
    decoder_log_probs,
)
from .captioner import (
    init_captioner,
    captioner_loss,
    build_contexts,
    generate,
)
