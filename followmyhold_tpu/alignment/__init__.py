from followmyhold_tpu.alignment.mesh_align import align_meshes_impl

__all__ = ["align_meshes_impl"]
