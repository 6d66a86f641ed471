"""cartographer_tpu: a TPU-native real-time LiDAR SLAM engine.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of Google
Cartographer (reference: cartographer-project/cartographer): 2D/3D local SLAM
(correlative + Gauss-Newton scan matching against probability-grid / TSDF /
voxel submaps), branch-and-bound loop closure over multi-resolution
precomputed grids, sparse pose-graph optimization (device Gauss-Newton/LM
with CG), pure localization, serialization, and multi-robot ingestion.

Array-first design: submap grids are fixed-shape device arrays, candidate
scoring is batched gathers, and solvers are matrix-free on device. Host code
handles sensor collation, configuration and pose-graph bookkeeping.
"""

__version__ = "0.1.0"
