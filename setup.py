"""Thin shim: all metadata lives in pyproject.toml ([project] table,
read by setuptools>=61). Exists so `pip install -e .` works through the
legacy path on hosts without the `wheel` package (this sandbox)."""

from setuptools import setup

setup()
