from .mesh import (DATA_AXIS, MODEL_AXIS, SPATIAL_AXIS, activation_sharding,
                   batch_sharding, make_mesh, replicated)
from .dp import DPNet, build_dp_pipeline, build_sharded_pipeline

__all__ = ["DATA_AXIS", "MODEL_AXIS", "SPATIAL_AXIS", "make_mesh",
           "batch_sharding", "activation_sharding", "replicated",
           "DPNet", "build_dp_pipeline", "build_sharded_pipeline"]
