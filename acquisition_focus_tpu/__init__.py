"""acquisition_focus_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for joint
optimization of acquisition orientation and cardiac volume reconstruction.

Re-designed from scratch for TPU hardware with the capabilities of the reference
implementation of "AcquisitionFocus: Joint Optimization of Acquisition Orientation and
Cardiac Volume Reconstruction Using Deep Learning" (Weihsbach et al., Sensors 2024).

Layering (bottom to top):
  ops/       — geometry-preserving resampler, rotation parameterizations, Pallas kernels
  geometry/  — label moment analysis, clinical cardiac view derivation, centroid registration
  data/      — NIfTI I/O, datasets (MMWHS/MRXCAT/synthetic), preprocessing, caching
  models/    — localization nets, affine transform modules, hybrid 2D->3D U-Net, baselines
  engine/    — losses, metrics, jitted train/eval steps, stage sweeps, checkpointing
  parallel/  — device mesh construction and sharding rules
"""

__version__ = "0.1.0"
