from followmyhold_tpu.utils.artifacts import (
    ImageArtifacts,
    artifacts_for,
    parse_cropped_hoi_name,
    should_skip,
)
from followmyhold_tpu.utils.debug import DebugDir
from followmyhold_tpu.utils.mesh_io import (
    HostMesh,
    load_mesh,
    pad_mesh,
    read_obj,
    read_ply,
    save_mesh,
    write_obj,
    write_ply,
)
from followmyhold_tpu.utils.prng import (
    SEED_GUIDANCE,
    SEED_HUNYUAN,
    SEED_INPAINT,
    stage_key,
)

__all__ = [
    "ImageArtifacts",
    "artifacts_for",
    "parse_cropped_hoi_name",
    "should_skip",
    "DebugDir",
    "HostMesh",
    "load_mesh",
    "pad_mesh",
    "read_obj",
    "read_ply",
    "save_mesh",
    "write_obj",
    "write_ply",
    "SEED_GUIDANCE",
    "SEED_HUNYUAN",
    "SEED_INPAINT",
    "stage_key",
]
