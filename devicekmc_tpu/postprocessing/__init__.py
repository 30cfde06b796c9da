"""Offline analysis of simulation output (reference: postprocessing/*.py).

The log schema written by the driver is key-compatible with the reference's
``output.txt``, so these tools work on either implementation's output.
"""

from .parse import parse_output, parse_snapshot

__all__ = ["parse_output", "parse_snapshot"]
