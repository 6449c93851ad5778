"""Native (C++) runtime components, compiled on demand.

Currently: ``mtxparse``, a fast MatrixMarket body parser used by the
SuiteSparse data loader (``lanczos_adjoints_tpu.utils.exp_util``).
The extension is built lazily with the system toolchain on first use
and cached next to this package; a pure-numpy fallback keeps everything
working without a compiler.
"""

import os
import subprocess
import sys
import sysconfig

_here = os.path.dirname(os.path.abspath(__file__))
_mtxparse = None
_build_attempted = False

# Set True to force the numpy fallback (benchmarking / debugging).
DISABLE = False


def _build_extension():
    """Compile mtxparse.cc into this directory with the system g++."""
    import numpy as np

    src = os.path.join(_here, "mtxparse.cc")
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(_here, f"mtxparse{suffix}")
    include_py = sysconfig.get_paths()["include"]
    include_np = np.get_include()
    cmd = [
        "g++",
        "-O2",
        "-shared",
        "-fPIC",
        "-std=c++17",
        f"-I{include_py}",
        f"-I{include_np}",
        src,
        "-o",
        out,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def get_mtxparse():
    """Return the compiled mtxparse module, or None if unavailable."""
    global _mtxparse, _build_attempted
    if DISABLE:
        return None
    if _mtxparse is not None:
        return _mtxparse
    if _build_attempted:
        return None
    _build_attempted = True
    try:
        try:
            from lanczos_adjoints_tpu.native import mtxparse  # noqa: PLC0415
        except ImportError:
            _build_extension()
            import importlib

            importlib.invalidate_caches()
            from lanczos_adjoints_tpu.native import mtxparse  # noqa: PLC0415
        _mtxparse = mtxparse
    except Exception:  # noqa: BLE001  compiler/toolchain absent
        _mtxparse = None
    return _mtxparse
