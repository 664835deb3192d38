from frozenbilm_tpu.data.features import (
    DirNpyFeatureStore,
    DictFeatureStore,
    PackedFeatureStore,
    open_feature_store,
    subsample_or_pad,
)
from frozenbilm_tpu.data.loader import DataLoader
from frozenbilm_tpu.data.videoqa import VideoQADataset, build_videoqa_dataset, videoqa_collate
from frozenbilm_tpu.data.videotext import VideoTextDataset, build_videotext_dataset, videotext_collate
from frozenbilm_tpu.data.mc import MCDataset, build_mc_dataset, mc_collate
