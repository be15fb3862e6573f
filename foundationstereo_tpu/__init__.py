"""FoundationStereo-TPU: a TPU-native stereo depth estimation framework.

A from-scratch JAX/XLA/Pallas re-design of the FoundationStereo (CVPR 2025)
pipeline (reference: /root/reference, TongZhe2016/FoundationStereo): hybrid
CNN + frozen monocular ViT feature extraction, 4D group-wise-correlation cost
volumes, attentive hybrid cost filtering with a disparity-axis transformer,
soft-argmin initialization, and iterative selective-ConvGRU refinement with
convex upsampling -- in NHWC/NDHWC layouts, with `jax.sharding` meshes for
scale-out and Pallas kernels for the hot loops.
"""

__version__ = "0.1.0"

from foundationstereo_tpu.config import ModelConfig  # noqa: F401
