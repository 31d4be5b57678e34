"""OpenStereo-TPU: a TPU-native stereo-matching framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of OpenStereo
(XiandaGuo/OpenStereo): stereo model zoo, cost-volume kernel library, data
pipeline, distributed trainer, evaluation, and deployment — built TPU-first:

- NHWC / NDHWC layouts (channels in the 128-lane dimension)
- static shapes everywhere; `lax.scan`/`lax.cond` for control flow
- bf16 compute policy instead of CUDA AMP + GradScaler
- data parallelism via `jax.sharding.Mesh` + jit-compiled collectives
  (the reference uses torch DDP/NCCL; see SURVEY.md §2.11)
- Pallas kernels for the hot cost-volume ops
"""

__version__ = "0.1.0"
