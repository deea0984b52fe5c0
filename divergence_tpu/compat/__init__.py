"""Compatibility shims for reference-platform protocols."""

from divergence_tpu.compat.analysisdef import (
    build_analysis_def,
    config_from_analysis_def,
    parse_analysis_def,
)

__all__ = [
    "parse_analysis_def",
    "config_from_analysis_def",
    "build_analysis_def",
]
