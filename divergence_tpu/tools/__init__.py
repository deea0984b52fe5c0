"""CLI tools — see :mod:`divergence_tpu.tools.cli`."""

from divergence_tpu.tools.cli import build_parser, main

__all__ = ["build_parser", "main"]
