"""DISCO-TPU: a TPU-native (JAX/XLA/Pallas) disentangled image colorization framework.

Re-implements the full capability surface of MenghanXia/DisentangledColorization
(SIGGRAPH Asia 2022) as an idiomatic JAX framework: every compute path is a jitted
XLA graph, superpixel pooling/unpooling are MXU-friendly tensor contractions (with
optional Pallas fusions), anchor clustering is a fixed-iteration vmapped k-means,
and multi-device scaling uses jax.sharding meshes rather than NCCL process groups.

Layout conventions (differ from the PyTorch reference on purpose):
  * images and feature maps are NHWC (TPU-native), not NCHW
  * token sequences are (batch, tokens, channels), not (tokens, batch, channels)
  * activations default to float32; pass compute_dtype=bfloat16 for speed
"""

__version__ = "0.1.0"
