"""Shim so `pip install -e .` works offline via the legacy editable path
(metadata lives in pyproject.toml's [project] table)."""
from setuptools import setup

setup()
