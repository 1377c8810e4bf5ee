from .mesh import DATA_AXIS, MODEL_AXIS, make_mesh, batch_sharding, replicated
from .dp import build_sharded_pipeline

__all__ = ["DATA_AXIS", "MODEL_AXIS", "make_mesh", "batch_sharding",
           "replicated", "build_sharded_pipeline"]
