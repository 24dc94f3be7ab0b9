from .indexconfig import (CoveringIndexConfig, ZOrderIndexConfig,
                          DataSkippingIndexConfig, SketchSpec, IvfIndexConfig,
                          MinHashIndexConfig)
from .graft import Graft, LakeTable

__all__ = ["Graft", "CoveringIndexConfig", "ZOrderIndexConfig",
           "DataSkippingIndexConfig", "SketchSpec", "IvfIndexConfig",
           "MinHashIndexConfig"]
