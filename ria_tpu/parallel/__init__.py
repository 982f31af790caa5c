from .mesh import make_mesh, make_sharded_rx

__all__ = ["make_mesh", "make_sharded_rx"]
