"""Retired-code tests run standalone (outside tests/): force CPU the same
way tests/conftest.py does — the machine presets JAX_PLATFORMS=axon."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
