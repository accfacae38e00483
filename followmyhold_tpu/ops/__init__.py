"""TPU-native numeric/geometry ops (pure JAX + Pallas kernels).

This layer replaces the reference's PyTorch3D / Kaolin / scipy / cv2 / CUDA
dependencies (SURVEY.md §2c) with jittable, differentiable equivalents.
"""

from followmyhold_tpu.ops import (  # noqa: F401
    camera,
    grid,
    icp,
    image,
    knn,
    losses,
    nms,
    precision,
    rasterizer,
    rotations,
    sdf,
    surface,
    transforms,
)
