"""qsvc_tpu — a TPU-native scalable video codec framework.

A from-scratch JAX/XLA/Pallas re-creation of the capabilities of QSVC/MCJ2K
(t+2D MCTF wavelet video coding with JPEG2000-style EBCOT entropy coding and
quality/spatial/temporal scalable extraction).  See SURVEY.md for the map
from reference components to this package.
"""

__version__ = "0.2.0"

import os as _os

import jax as _jax

# Persistent XLA compilation cache: the flagship 1080p encode graph takes
# minutes to compile (remote-compiled over the tunneled chip); caching cuts
# repeat-process warmup to ~1s.  Only set a default when the embedding
# application hasn't chosen its own cache dir (tests pin their own).
if _jax.config.jax_compilation_cache_dir is None:
    from .utils import cachedir as _cachedir
    _cachedir.configure(_jax, _os.path.expanduser(_os.environ.get(
        "QSVC_COMPILE_CACHE", "~/.cache/qsvc_tpu_jax")))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from .config import CodecConfig, gop_size  # noqa: F401
