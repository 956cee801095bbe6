"""NVIDIA Apex shim: AMP is a no-op on CPU torch (the reference's O1 mixed
precision has no CPU equivalent); ``initialize`` returns its inputs and
``scale_loss`` yields the loss unscaled (reference main.py:185,219-220)."""

from . import amp  # noqa: F401
