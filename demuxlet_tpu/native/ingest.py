"""Native C++ host-ingest bindings (ctypes). Placeholder until built.

The native path replaces io/bam.py + host/pileup.py for production-scale
BAMs; the Python path remains the reference-correct fallback.
"""

from __future__ import annotations


def available() -> bool:
    return False


def build_pileup(*a, **kw):  # pragma: no cover
    raise NotImplementedError("native ingest not built")
