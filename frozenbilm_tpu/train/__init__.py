from frozenbilm_tpu.train.partition import merge_params, partition_params, trainable_mask
from frozenbilm_tpu.train.optim import make_optimizer, make_schedule
