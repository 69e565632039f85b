"""Composable processing pipelines (the framework's "model" layer)."""

from .pipeline import (
    PipelineConfig,
    calibrate_register_stack,
    frame_noise_stats,
)

__all__ = [
    "PipelineConfig",
    "calibrate_register_stack",
    "frame_noise_stats",
]
