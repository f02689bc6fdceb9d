"""learn_region_grow_tpu — TPU-native (JAX/XLA/Pallas) rebuild of LRGNet.

A from-scratch framework with the capabilities of jingdao/learn_region_grow
("LRGNet: Learnable Region Growing for Class-Agnostic Point Cloud
Segmentation", RAL 2021), re-designed TPU-first:

* the dual-branch PointNet scorer runs as batched fused XLA/Pallas programs,
* the host-driven one-region-at-a-time grow loop of the reference
  (``test_region_grow.py:208-306``) becomes fixed-shape masked device state
  advanced inside ``jax.lax.while_loop`` with many rooms growing in parallel,
* the CUDA custom ops (``tf_ops/{sampling,grouping,3d_interpolation}``) are
  replaced by Pallas/XLA kernels with identical semantics,
* data staging (the region-growing simulator of ``stage_data.py``) is a
  vectorized pipeline instead of per-point Python dict loops.

Subpackages
-----------
``core``      voxel grids, resolution equalization, normals/curvature
``ops``       kernel tier: FPS, ball query, grouping, 3-NN interpolation
``models``    LrgNet, PointNet, PointNet++, MCPNet + metric losses
``data``      H5 I/O, the growth simulator, synthetic rooms, stagers
``engine``    batched region-growing inference (greedy / beam / restart)
``eval``      clustering + instance-matching metrics
``parallel``  device mesh + sharded train/eval steps
``train``     trainers and checkpointing
``cli``       command-line entry points mirroring the reference scripts
"""

__version__ = "0.1.0"
