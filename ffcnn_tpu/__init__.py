"""ffcnn-tpu: a TPU-native Darknet/YOLO inference framework (JAX/XLA/Pallas)
with the capabilities of rockcarry/ffcnn.  See README.md and SURVEY.md."""

from .net import Detection, Net, load, DEFAULT_MEAN, DEFAULT_NORM
from .darknet import parse_cfg, dump, load_weights

__version__ = "0.1.0"
__all__ = ["Net", "Detection", "load", "parse_cfg", "dump", "load_weights",
           "DEFAULT_MEAN", "DEFAULT_NORM"]
