"""Minimal torchvision stand-in so the unmodified reference runs here.

This environment has torch (CPU) but no torchvision/apex; the reference
(/root/reference) imports both. These shims implement exactly the public
API surface the reference consumes (model.py:4,86; main.py:13,126-127) with
plain torch/PIL — they exist to *measure* the reference, not to change it.
"""

from . import models, transforms  # noqa: F401
