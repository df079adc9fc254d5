"""Native (C++) canonicalization kernels with transparent numpy fallback.

Compiled on demand with g++ into a cached shared library and bound through
ctypes (pybind11 is not in the image). If the toolchain is unavailable the
pure-numpy implementations in tensor_rep take over — results are identical.
"""

from .build import get_lib, native_available
from .ops import coo_matmat, join_pairs

__all__ = ["get_lib", "join_pairs", "coo_matmat", "native_available"]
