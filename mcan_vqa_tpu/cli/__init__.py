"""CLI entry points (reference run.py / run_mimic.py flag surface)."""

import argparse

_TRUE = ("true", "1", "yes", "y", "on")
_FALSE = ("false", "0", "no", "n", "off")


def cli_bool(s: str) -> bool:
    """Strict boolean flag parser for the reference-style ``--flag=True``
    arguments. The previous ``lambda s: s == "True"`` silently parsed
    every other spelling ("true", "1", "yes") as False — for ``--resume``
    that inversion is DESTRUCTIVE (a fresh-run branch deletes the
    version's checkpoint directory), so unknown spellings must be an
    argparse error, not a quiet False."""
    low = s.strip().lower()
    if low in _TRUE:
        return True
    if low in _FALSE:
        return False
    raise argparse.ArgumentTypeError(
        f"expected a boolean (True/False), got {s!r}")
