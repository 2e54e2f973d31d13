"""TPU-native simultaneous diffusion for LiDAR point clouds.

A from-scratch JAX/Flax/Pallas re-design of the capabilities of
Ryan-Faulkner/Simultaneous-Diffusion-for-Pointclouds (an NCSNv2/LiDARGen fork
with cross-view "simultaneous diffusion"): score-based generation of LiDAR
range images with annealed Langevin dynamics, where several spatially-offset
synthetic viewpoints of one scene are denoised jointly with a 3D
reproject-and-merge consistency correction fused into every step.

Everything on the compute path is a single jitted XLA program: the score
network is a Flax NCSNv2 RefineNet, the 232-level Langevin schedule is a
``lax.scan``, and the cross-view z-buffer merge is a batched segment
reduction (no per-view host loop).

Subpackages
-----------
- ``ops``       geometry (range projection / unprojection), scatter kernels
- ``models``    NCSNv2 score-network family (Flax), EMA
- ``diffusion`` sigma schedules, DSM losses, Langevin + simultaneous samplers
- ``data``      datasets and host-side input pipeline
- ``parallel``  mesh / sharding helpers for multi-chip execution
- ``runners``   train / sample orchestration matching the reference CLI
- ``utils``     checkpointing, logging
"""

__version__ = "0.1.0"
