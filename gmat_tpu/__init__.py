"""gmat_tpu — TPU-native rebuild of NVIDIA GMAT (video/image processing).

Compute path: JAX/XLA/Pallas on batched planar frames.
Host path: libav*-backed native ingest (demux/decode/encode/mux) + C++
entropy codecs, bound via ctypes.
"""

__version__ = "0.1.0"

from .core.frame import FrameBatch, unpack_nv12, pack_nv12  # noqa: F401
from .core import formats  # noqa: F401
