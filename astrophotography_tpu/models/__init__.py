"""Composable processing pipelines (the framework's "model" layer)."""

from .pipeline import (
    PipelineConfig,
    calibrate_register_stack,
    calibrate_register_stack_lean,
    frame_noise_stats,
    register_frames,
)

__all__ = [
    "PipelineConfig",
    "calibrate_register_stack",
    "calibrate_register_stack_lean",
    "frame_noise_stats",
    "register_frames",
]
