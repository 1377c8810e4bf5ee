from .ir import (Activation, BlobShape, Layer, LayerType, NetIR,
                 ACTIVATION_NAMES, LAYER_TYPE_NAMES)
from .cfg import parse_cfg, dump
from .weights import load_weights, FoldedConvParams

__all__ = ["Activation", "BlobShape", "Layer", "LayerType", "NetIR",
           "ACTIVATION_NAMES", "LAYER_TYPE_NAMES", "parse_cfg", "dump",
           "load_weights", "FoldedConvParams"]
