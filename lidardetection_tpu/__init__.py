"""LidarDetection-TPU: a TPU-native LiDAR 3D object detection framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
zhengjingsen/LidarDetection (an OpenPCDet v0.3.0 fork): PointPillar, SECOND,
PointRCNN, Part-A2 and PV-RCNN detector families over KITTI/NuScenes-style
datasets, with data-parallel training over a `jax.sharding.Mesh`.

Design stance (NOT a port):
  * one jitted, static-shape train/eval step per detector — every formerly
    dynamic quantity (num voxels, num gt boxes, num rois, NMS keeps) is a
    fixed capacity + validity mask;
  * the reference's mutable ``batch_dict`` (pcdet/models/__init__.py:16-41)
    becomes an immutable pytree of fixed-shape arrays threaded through pure
    functions;
  * the reference's CUDA extensions (pcdet/ops/*) and spconv become
    XLA-native vectorized ops and Pallas TPU kernels;
  * DDP/NCCL (pcdet/utils/common_utils.py:146-227) becomes shard_map over an
    ICI mesh with psum gradient reduction.
"""

__version__ = "0.1.0"
