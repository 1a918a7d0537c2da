"""Optional torch-reference oracle for parity tests.

Loads the upstream reference implementation (read-only mount at
/root/reference) when present, so numerics can be validated bit-for-bit
against it. All tests using this must skip gracefully when the reference or
torch is unavailable — the suite must stand on its own hand-computed cases.
"""

import os
import sys

REFERENCE_PATH = os.environ.get("PIT_REFERENCE_PATH", "/root/reference")


def load_reference():
    """Return the reference modules (pit, utils) or None."""
    if not os.path.isdir(REFERENCE_PATH):
        return None
    try:
        import torch  # noqa: F401
    except ImportError:
        return None
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    try:
        import pit as ref_pit  # type: ignore
        import utils as ref_utils  # type: ignore
    except Exception:
        return None
    return ref_pit, ref_utils
