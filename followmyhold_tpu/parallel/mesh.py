"""Device mesh + sharding policy.

The reference scales out with SLURM job arrays over image chunks
(src/foho/guidance/run.py:178-185) and has no intra-model parallelism
(SURVEY.md §2d). The TPU-native story:

- **dp** axis: data-parallel over the image batch — replaces SLURM arrays.
  Every stage function is jitted with its batch dim sharded over dp; XLA
  inserts the (nonexistent — stages are embarrassingly parallel) collectives.
- **tp** axis: tensor-parallel sharding of the big transformer weights
  (DiT/VAE/ViT): attention heads and MLP hidden dims split over tp, riding
  ICI via all-reduce on the row-parallel projections.

parse_mesh_shape handles the MESH_SHAPE config key ("dp=4,tp=2"; -1 = fill
with remaining devices).
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def parse_mesh_shape(spec: str, num_devices: Optional[int] = None) -> Dict[str, int]:
    """'dp=4,tp=2' -> {'dp': 4, 'tp': 2}; one axis may be -1 (= fill)."""
    if num_devices is None:
        num_devices = len(jax.devices())
    axes: Dict[str, int] = {}
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        m = re.fullmatch(r"(\w+)=(-?\d+)", part)
        if not m:
            raise ValueError(f"Bad MESH_SHAPE entry: {part!r}")
        axes[m.group(1)] = int(m.group(2))
    fills = [k for k, v in axes.items() if v == -1]
    if len(fills) > 1:
        raise ValueError("Only one mesh axis may be -1")
    fixed = int(np.prod([v for v in axes.values() if v != -1])) if axes else 1
    if fills:
        if num_devices % fixed:
            raise ValueError(f"{num_devices} devices not divisible by {fixed}")
        axes[fills[0]] = num_devices // fixed
    return axes


def make_mesh(spec: str = "dp=-1", devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    axes = parse_mesh_shape(spec, len(devices))
    shape = tuple(axes.values())
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"Mesh {axes} does not cover {len(devices)} devices")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, tuple(axes.keys()))


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch/image) dimension over `axis`."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_model_params(params, mesh: Mesh, tp_axis: str = "tp"):
    """Tensor-parallel weight layout for the transformer stacks.

    Policy (scaling-book megatron-style):
    - column-parallel: qkv / mlp-in kernels -> shard OUTPUT dim over tp
    - row-parallel: attn-proj / mlp-out kernels -> shard INPUT dim over tp
    - everything else (norms, embeddings, biases) replicated.
    XLA then inserts one all-reduce per block over ICI.
    """
    if tp_axis not in mesh.axis_names:
        return jax.device_put(params, replicate(mesh))

    col_names = ("qkv", "to_qkv", "to_q", "to_kv", "fc1", "ff1", "mlp1",
                 "linear1", "in_layer", "kv", "q")
    row_names = ("proj", "to_out", "fc2", "ff2", "mlp2", "linear2",
                 "out_layer", "img_proj", "txt_proj")

    def spec_for(path, leaf):
        names = [getattr(k, "key", str(k)) for k in path]
        # nn.scan depth-folding gives every block kernel a leading depth axis
        # (ndim 3: [depth, in, out]); plain kernels are [in, out]. Both shard:
        # column-parallel on the OUT dim (last), row-parallel on the IN dim.
        is_kernel = names and names[-1] == "kernel" and leaf.ndim in (2, 3)
        if not is_kernel:
            return P()
        parent = names[-2] if len(names) >= 2 else ""
        lead = (None,) * (leaf.ndim - 2)
        tp_size = mesh.shape[tp_axis]
        if any(parent == n or parent.endswith(n) for n in col_names):
            if leaf.shape[-1] % tp_size == 0:
                return P(*lead, None, tp_axis)
        if any(parent == n or parent.endswith(n) for n in row_names):
            if leaf.shape[-2] % tp_size == 0:
                return P(*lead, tp_axis, None)
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(leaf, NamedSharding(mesh, spec_for(path, leaf))),
        params,
    )
