"""FollowMyHold-TPU: a TPU-native JAX framework for single-image hand-object
interaction (HOI) 3D reconstruction.

This is a ground-up TPU-first rebuild of the capabilities of
aidilayce/FollowMyHold (3DV 2026, arXiv 2508.18213): given one RGB photo of a
hand holding an object, produce a posed MANO hand mesh and a watertight object
mesh, geometrically consistent with the image.

Where the reference composes CUDA/torch stacks (PyTorch3D, Kaolin, diffusers)
across conda subprocesses, this framework is a single JAX process:

- every stage is a pure function over pytrees, jitted once and mapped over an
  image shard (``followmyhold_tpu.parallel``),
- the compute path is jax/XLA with Pallas kernels for hot ops
  (``followmyhold_tpu.ops``),
- model stacks (HaMeR, MoGe-2, Hunyuan3D-2 DiT/ShapeVAE) are Flax modules with
  bf16 matmuls and fp32 losses (``followmyhold_tpu.models``),
- the guidance-in-the-loop sampler differentiates render losses through the
  flow-matching sampler on device (``followmyhold_tpu.diffusion``).

Public surface mirrors the reference: per-module ``run(...)`` + argparse
``main()`` and env-file driven ``followmyhold_tpu.main --config`` (reference:
src/foho/main.py:281-288).
"""

__version__ = "0.1.0"
