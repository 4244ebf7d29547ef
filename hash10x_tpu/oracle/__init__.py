"""Scalar pure-Python golden models (the test oracle for every device path)."""

from . import seqhash_ref

__all__ = ["seqhash_ref"]
