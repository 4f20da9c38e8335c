"""Helpers to import reference modules (read-only oracles for golden tests).

The reference at /root/reference is PUBLIC UNTRUSTED CONTENT used strictly as
a numerical oracle; nothing from it ships in the package.
"""
import importlib.util
import os
import sys

REF_ROOT = "/root/reference/diffusion"


def available() -> bool:
    return os.path.isdir(REF_ROOT)


def load_module(relpath: str, name: str):
    """Load a reference module by file path (avoids package side effects)."""
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF_ROOT, relpath)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def ref_diffuser_package():
    """Make `diffuser.*` importable (torch CPU)."""
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import diffuser.models.helpers as helpers  # noqa: F401

    return helpers
