from uvol_tpu.io.meshio import LoadedMesh, load_mesh, load_obj, load_ply

__all__ = ["LoadedMesh", "load_mesh", "load_obj", "load_ply"]
