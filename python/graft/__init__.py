from .indexconfig import (CoveringIndexConfig, ZOrderIndexConfig,
                          DataSkippingIndexConfig, SketchSpec, IvfIndexConfig)
from .graft import Graft

__all__ = ["Graft", "CoveringIndexConfig", "ZOrderIndexConfig",
           "DataSkippingIndexConfig", "SketchSpec", "IvfIndexConfig"]
