"""Docstring section parsing (P33 — reference __init__.py:25-40 maps
MATLAB docstring headers onto documentation section kinds).

``docstring_sections`` splits a normalized docstring into (kind, content)
blocks keyed by the MATLAB-convention headers below; text before the first
header is the 'description' section."""

from __future__ import annotations

import re

# header line → section kind (the reference's header set, re-keyed)
SECTION_KINDS = {
    "input arguments": "parameters",
    "arguments": "parameters",
    "name-value arguments": "other parameters",
    "name-value pairs": "other parameters",
    "output arguments": "returns",
    "outputs": "returns",
    "returns": "returns",
    "examples": "examples",
    "example": "examples",
    "see also": "see_also",
    "references": "references",
    "notes": "notes",
    "note": "notes",
    "raises": "raises",
    "errors": "raises",
}

_HEADER_RE = re.compile(r"^\s*([A-Za-z][A-Za-z -]*?)\s*:\s*$")


def docstring_sections(doc: str | None) -> list[tuple[str, str]]:
    if not doc:
        return []
    sections: list[tuple[str, str]] = []
    kind = "description"
    buf: list[str] = []

    def flush() -> None:
        text = "\n".join(buf).strip("\n")
        if text.strip():
            sections.append((kind, text))

    for line in doc.split("\n"):
        m = _HEADER_RE.match(line)
        key = m.group(1).strip().lower() if m else None
        if key in SECTION_KINDS:
            flush()
            kind = SECTION_KINDS[key]
            buf = []
        else:
            buf.append(line)
    flush()
    return sections
