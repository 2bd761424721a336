"""TMDiff-TPU: a TPU-native (JAX/XLA/Pallas) text-modulated diffusion framework
for unified multi-sensor satellite pansharpening.

Re-designed from scratch against the behavioral contract of the reference
PyTorch repo (codgodtao/TMDiff, mounted at /root/reference) — see SURVEY.md.
The compute path is pure JAX with Pallas TPU kernels for hot ops; parallelism
is expressed as shardings over a `jax.sharding.Mesh` and compiled by XLA SPMD.
"""

__version__ = "0.1.0"
