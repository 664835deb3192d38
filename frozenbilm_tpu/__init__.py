"""frozenbilm_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video question-answering
framework with the capabilities of FrozenBiLM (NeurIPS 2022).

Frozen bidirectional language models + lightweight trainable adapters consume
CLIP ViT-L/14 frame features as prefix "visual tokens"; downstream VideoQA is
answered by scoring an answer vocabulary at a [MASK] position (encoder models)
or by teacher-forced next-token scoring (autoregressive models).

Design: pure-functional models over plain dict parameter pytrees, an explicit
frozen/trainable partition (optimizer state exists only for the trainable
leaves), jit-compiled train/eval steps, and `jax.sharding.Mesh`-based SPMD for
multi-chip scaling. Reference behavior spec: antoyang/FrozenBiLM.
"""

__version__ = "0.1.0"
