"""snvc_tpu — a TPU-native stereo 3D object detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of SNVC
("Stereo Neural Vernier Caliper", AAAI 2022): multi-resolution voxel-based
stereo 3D object detection on KITTI, consisting of

* a global ("main scale") stereo detector: plane-sweep cost volume over
  depth hypotheses -> 3D CNN -> BEV anchor-free detection head,
* an instance-level ("Vernier scale") refinement model that erects a
  high-resolution object-centric voxel grid around any 3D proposal and
  predicts part confidence fields to update the pose, and
* the surrounding framework: KITTI data substrate, geometry, losses,
  training/inference drivers, rotated IoU/NMS, KITTI AP evaluation.

Design notes (TPU-first, not a port):
  - all device code is JAX (jit/pjit/shard_map); hot gathers and the
    plane-sweep volume are Pallas kernels with XLA fallbacks,
  - static shapes everywhere: variable instance counts are padded to
    buckets and carried with validity masks,
  - NHWC / NDHWC layouts, bf16 activations with fp32 accumulation,
  - scaling via jax.sharding.Mesh (data axis over ICI); no explicit
    communication library.
"""

__version__ = "0.1.0"
