from .baseline import VQABaselineNet
from .coattention import HierarchicalCoAttentionNet

__all__ = ["VQABaselineNet", "HierarchicalCoAttentionNet"]
