"""i2pnet_tpu — a TPU-native (JAX/XLA/Pallas) 2D-3D registration framework.

Re-implements the capabilities of IRMVLab/I2PNet (TRO 2025): end-to-end
RGB-image <-> LiDAR-point-cloud registration regressing an SE(3) correction
(unit quaternion + translation), for vehicle localization and camera-LiDAR
online calibration.

Design stance (TPU-first, not a port):
  * channels-last layouts everywhere, static shapes, masking instead of
    dynamic sizes;
  * dense-KNN via MXU matmuls + top_k; FPS as an on-device scan;
  * the reference's CUDA ops (pointnet2, fused_conv_select_k) become
    vectorized jnp / Pallas kernels;
  * one jitted train step, pjit/shard_map data parallelism over a Mesh.
"""

__version__ = "0.1.0"
