"""Live-script parsing: binary .mlx (ZIP / OOXML document.xml) and
plain-text R2025a live code (%% sections).

Behavioral spec: /root/reference/src/maxx/livescript.py:42-299. Pure
stdlib (zipfile + ElementTree) — Arrow-batch safe on Spark workers.
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET

_W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_W = "{" + _W_NS + "}"
_CODE_STYLE = "matlab-Code"

_SECTION_RE = re.compile(r"^\s*%%(\s|$)")
_COMMENT_RE = re.compile(r"^\s*%")


def is_binary_mlx(data: bytes) -> bool:
    return data[:2] == b"PK"


# -- plain-text live code ----------------------------------------------------


def parse_plaintext_livescript(source: str) -> list[tuple[str, str]]:
    """Split plain-text live code into ordered (kind, content) sections.

    A ``%%`` line starts a new section; a section whose body lines are all
    ``%`` comments is 'text', else 'code'; the ``%%`` header line itself is
    stripped from the content; empty sections are dropped.
    """
    raw_parts: list[str] = []
    current: list[str] = []
    for line in source.splitlines(keepends=True):
        if _SECTION_RE.match(line) and current:
            raw_parts.append("".join(current))
            current = [line]
        else:
            current.append(line)
    if current:
        raw_parts.append("".join(current))

    sections: list[tuple[str, str]] = []
    for part in raw_parts:
        part = part.strip()
        if not part:
            continue
        kind = _classify(part)
        content = _strip_header(part)
        if content.strip():
            sections.append((kind, content))
    return sections


def _classify(text: str) -> str:
    lines = [ln for ln in text.splitlines() if ln.strip()]
    if not lines:
        return "text"
    body = lines[1:] if _SECTION_RE.match(lines[0]) else lines
    if not body:
        return "text"
    return "text" if all(_COMMENT_RE.match(ln) for ln in body) else "code"


def _strip_header(text: str) -> str:
    lines = text.splitlines(keepends=True)
    if lines and _SECTION_RE.match(lines[0]):
        return "".join(lines[1:]).strip()
    return text.strip()


# -- binary .mlx --------------------------------------------------------------


def parse_mlx_bytes(data: bytes) -> list[tuple[str, str]]:
    """Extract ordered (kind, content) sections from a binary .mlx file.

    The archive's ``matlab/document.xml`` (OOXML) holds paragraphs; style
    ``matlab-Code`` → code, everything else → text; consecutive same-kind
    paragraphs merge; empty sections are dropped. Legacy documents without
    the WordProcessingML namespace are namespace-normalized first.
    """
    with zipfile.ZipFile(io.BytesIO(data), "r") as zf:
        doc_name = next((n for n in zf.namelist() if n.endswith("document.xml")), None)
        if doc_name is None:
            raise ValueError("no document.xml in .mlx archive")
        xml_bytes = zf.read(doc_name)

    try:
        root = ET.fromstring(xml_bytes)
    except ET.ParseError:
        return []

    # Legacy documents carry unqualified tags: qualify every tag in one
    # iterative stack sweep, then look the body up uniformly.
    if root.find(f"{_W}body") is None and root.find("body") is not None:
        stack = [root]
        while stack:
            el = stack.pop()
            if el.tag and not el.tag.startswith("{"):
                el.tag = _W + el.tag
            stack.extend(el)
    body = root.find(f"{_W}body")
    if body is None:
        return []

    paras = [(_para_kind(p), _para_text(p)) for p in body.iter(f"{_W}p")]
    return _merge_para_runs(paras)


def _merge_para_runs(paras: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """Consecutive same-kind paragraphs form one section (non-empty texts
    newline-joined); whitespace-only sections drop."""
    from itertools import groupby

    merged = (
        (kind, "\n".join(t for _, t in grp if t))
        for kind, grp in groupby(paras, key=lambda kt: kt[0])
    )
    return [(k, c) for k, c in merged if c.strip()]


def _para_kind(para) -> str:
    ppr = para.find(f"{_W}pPr")
    if ppr is not None:
        style = ppr.find(f"{_W}pStyle")
        if style is not None:
            val = style.get(f"{_W}val") or style.get("val") or ""
            if val == _CODE_STYLE:
                return "code"
    return "text"


def _para_text(para) -> str:
    parts = []
    for run in para.iter(f"{_W}r"):
        for t in run.iter(f"{_W}t"):
            if t.text:
                parts.append(t.text)
    return "".join(parts)
