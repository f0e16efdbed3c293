"""Session-scratch artifact tracking.

Operators that materialize intermediate stages to parquet (MinHash
signatures, ranged id layouts) write uniquely-named paths under the OS
temp dir — unique because the artifact must match exactly the DataFrame
that produced it, and the returned plan keeps reading the files for the
life of the session. This registry deletes them at interpreter exit so
repeated library calls in long sessions don't accumulate unbounded /tmp
usage (best-effort: an OS temp cleaner remains the backstop for crashed
processes)."""

from __future__ import annotations

import atexit
import shutil

_PATHS: list[str] = []


def track(path: str) -> str:
    """Register a scratch path for end-of-process removal."""
    _PATHS.append(path)
    return path


@atexit.register
def _cleanup() -> None:  # pragma: no cover - exercised at interpreter exit
    for p in _PATHS:
        shutil.rmtree(p, ignore_errors=True)
