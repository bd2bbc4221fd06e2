"""qsvc_tpu — a TPU-native scalable video codec framework.

A from-scratch JAX/XLA/Pallas re-creation of the capabilities of QSVC/MCJ2K
(t+2D MCTF wavelet video coding with JPEG2000-style EBCOT entropy coding and
quality/spatial/temporal scalable extraction).  See SURVEY.md for the map
from reference components to this package.
"""

__version__ = "0.1.0"

from .config import CodecConfig, gop_size  # noqa: F401
