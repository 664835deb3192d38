"""CLIP frame preprocessing (numpy, NHWC).

Constants replicated from reference extract/preprocessing.py:14-24:
/255 then per-channel normalize with the OpenAI CLIP mean/std (the +1e-8
in the std denominator included for bit-parity of stored features).
"""

from __future__ import annotations

import numpy as np

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_frames(frames_u8: np.ndarray) -> np.ndarray:
    """(N, H, W, 3) uint8 -> (N, H, W, 3) float32 CLIP-normalized."""
    x = frames_u8.astype(np.float32) / 255.0
    return (x - CLIP_MEAN) / (CLIP_STD + 1e-8)
