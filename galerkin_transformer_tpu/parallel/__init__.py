from .mesh import make_mesh, batch_sharding, replicate

__all__ = ["make_mesh", "batch_sharding", "replicate"]
