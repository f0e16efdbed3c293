"""Shared SCALING.md section management for the probe tools.

Each probe owns one ``## ...`` appendix section identified by its marker
line; regenerating a probe replaces ONLY its own section and leaves every
other probe's rows intact (the carry-forward contract scale_probe
established for the main table).
"""

from __future__ import annotations

from pathlib import Path

SCALING_PATH = Path(__file__).resolve().parent.parent / "SCALING.md"


def replace_section(marker: str, lines: list[str]) -> None:
    """Replace (or append) the section starting at ``marker`` — a full
    ``## ...`` heading line — up to the next ``## `` heading."""
    text = SCALING_PATH.read_text(encoding="utf-8")
    if marker in text:
        head, _, rest = text.partition(marker)
        nxt = rest.find("\n## ")
        tail = rest[nxt + 1 :] if nxt >= 0 else ""
        text = head + tail
    if not text.endswith("\n"):
        text += "\n"
    text += "\n".join(lines) + "\n"
    SCALING_PATH.write_text(text, encoding="utf-8")
    print(f"appended '{marker}' section to {SCALING_PATH}")
