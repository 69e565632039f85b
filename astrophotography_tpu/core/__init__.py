"""High-level engine classes mirroring the reference core surface
(reference core/__init__.py:6-34) on top of the device ops layer."""

from .raw_conv import RawConv

__all__ = ["RawConv"]
