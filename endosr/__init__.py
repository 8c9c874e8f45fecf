"""endosr — TPU-native depth-aware endoscopy super-resolution framework.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of
CUHK-AIM-Group/Depth-Aware-Endoscopy-SR (IEEE JBHI 2022): the Dynamic
Depth-Aware Network (DepthNet) with SEAN depth-conditioned normalization,
the BasicSR-style config/data/model/network stack around it, and the
vendored monodepth2 depth-estimation sub-project.

Layout (see SURVEY.md for the reference map this mirrors capability-wise):
  ops/      pure-function numerics: MATLAB-exact bicubic resize (as matmuls),
            color conversion, depth-mask binning, augmentation
  kernels/  Pallas TPU kernels for the hot ops (fused SEAN, region pooling)
  nn/       flax.linen network architectures (NHWC, bf16-friendly)
  losses/   pixel/SSIM/mask/dynamic-mask/GAN/perceptual/depth losses
  config/   YAML option system (schema-compatible with the reference)
  data/     host-side dataset + sharded, prefetching loader
  models/   training wrappers (create_model registry) + LR schedules
  parallel/ mesh construction and sharding helpers
  metrics/  MATLAB-conformant PSNR/SSIM + depth metrics
  depth/    monodepth2-equivalent depth estimation (inference + training)
  utils/    logging, checkpointing, misc
"""

__version__ = "0.1.0"
