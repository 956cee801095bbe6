from .dataset import VQASamples
from .pipeline import DataLoader, make_image_preprocessor

__all__ = ["VQASamples", "DataLoader", "make_image_preprocessor"]
