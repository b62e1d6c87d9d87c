"""LM-Net TPU: a TPU-native JAX/Flax/Pallas medical image segmentation framework.

A from-scratch rebuild of the capabilities of the LM-Net reference
(Asunatan/LM-Net): a lightweight multi-scale U-shaped encoder-decoder with
re-parameterizable multi-branch depthwise convolutions, multi-scale skip
fusion, neighborhood attention, and a global-attention bottleneck -- designed
TPU-first (NHWC layouts, XLA-fusable ops, Pallas kernels for the hot paths,
jit + Mesh/NamedSharding data parallelism over ICI).

Nothing here is a port: the reference (PyTorch/CUDA) defines *what* to build;
this package defines *how* on TPU.
"""

__version__ = "0.1.0"
