"""World coordinate systems and astrometry."""

from .wcs import TanWCS

__all__ = ["TanWCS"]
