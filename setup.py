"""Shim for legacy tooling; configuration lives in pyproject.toml
(parity role of ref setup.py:1-27)."""

from setuptools import setup

setup()
