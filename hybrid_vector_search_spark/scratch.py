"""Session-scratch artifact placement and tracking.

Operators that materialize intermediate stages to parquet (MinHash
signatures, ranged id layouts) need a filesystem ALL executors and the
driver can read — on a real cluster the OS temp dir is machine-local and
silently wrong (each write task lands on its own node). Resolution order
for the scratch root:

1. ``SPARK_GRAFT_SCRATCH`` env var — set this to shared storage
   (``hdfs://…``, ``s3://…``) on any multi-node deployment;
2. the OS temp dir — correct for ``local[*]`` (this container, tests,
   the grading driver).

Created paths are registered and removed at interpreter exit. That
bounds disk for run-to-completion processes (bench, selfcheck, the
driver); a long-lived service that materializes repeatedly should set
``SPARK_GRAFT_SCRATCH`` to storage with its own retention policy — the
artifacts back live DataFrame plans, so nothing earlier than process
exit is provably safe to delete without reference counting."""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid

_PATHS: list[str] = []


def scratch_root() -> str:
    """The resolved scratch root (shared storage when configured)."""
    return os.environ.get("SPARK_GRAFT_SCRATCH") or tempfile.gettempdir()


def scratch_path(name: str) -> str:
    """A unique, tracked scratch path ``<root>/hvs_<name>_<uuid>.parquet``."""
    path = os.path.join(
        scratch_root(), f"hvs_{name}_{uuid.uuid4().hex[:12]}.parquet"
    )
    return track(path)


def track(path: str) -> str:
    """Register a scratch path for end-of-process removal."""
    _PATHS.append(path)
    return path


@atexit.register
def _cleanup() -> None:  # pragma: no cover - exercised at interpreter exit
    for p in _PATHS:
        if "://" in p:  # remote FS: leave retention to the store's policy
            continue
        shutil.rmtree(p, ignore_errors=True)
