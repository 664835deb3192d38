from frozenbilm_tpu.ops.masking import (
    get_mask,
    masked_softmax,
    mlm_corrupt,
)
from frozenbilm_tpu.ops.rel_pos import (
    make_log_bucket_position,
    build_relative_position,
)
