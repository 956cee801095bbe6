from .coattention_kernel import coattention_fused

__all__ = ["coattention_fused"]
