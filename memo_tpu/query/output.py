"""Bit-exact output formatting.

The reference writes conservation as one int per line via
``print(*rec, sep='\\n', file=...)`` (memo_query.py:70-71) and membership via
``np.savetxt(..., delimiter=' ', fmt='%i')`` (memo_query.py:67-68). Both end
with a trailing newline. These writers reproduce the bytes exactly, using
vectorized uint8 assembly instead of per-row Python formatting.
"""

from __future__ import annotations

import os
from typing import IO

import numpy as np


def format_conservation(values: np.ndarray) -> bytes:
    values = np.asarray(values)
    if values.size == 0:
        return b""
    vmax = int(values.max())
    lut = {v: str(v).encode() for v in range(min(int(values.min()), 0), vmax + 1)}
    return b"\n".join(lut[int(v)] for v in values.tolist()) + b"\n"


def format_membership(mat: np.ndarray) -> bytes:
    """Rows of space-separated single digits (values are 0/1)."""
    mat = np.asarray(mat)
    L, C = mat.shape
    if L == 0:
        return b""
    out = np.full((L, 2 * C), np.uint8(ord(" ")), dtype=np.uint8)
    out[:, 0::2] = mat.astype(np.uint8) + ord("0")
    out[:, -1] = ord("\n")
    return out.tobytes()


def _write(data: bytes, path_or_file: str | os.PathLike | IO[bytes]) -> None:
    if hasattr(path_or_file, "write"):
        path_or_file.write(data)
    else:
        with open(path_or_file, "wb") as fh:
            fh.write(data)


def write_conservation(values: np.ndarray, path_or_file) -> None:
    _write(format_conservation(values), path_or_file)


def write_membership(mat: np.ndarray, path_or_file) -> None:
    _write(format_membership(mat), path_or_file)
