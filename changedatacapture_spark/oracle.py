"""Single-node pure-Python oracle for the engine.

Two pieces:

1. **Transform oracle** — verbatim ports of the reference's per-event
   transform functions. These ARE the graded per-row invariant ("byte-identical
   extracted text per url", BASELINE.json input_hint):

   - ``chunk_by_sections``  ← /root/reference/main.py:105-159 (verbatim
     behaviour: markdown/numbered-heading split with char offsets)
   - ``txt_to_markdown``    ← /root/reference/main.py:356-382 (line-wise
     normalization: "1. ABC" → "## ABC", bullets kept, blanks kept)
   - ``html_to_text``       — our engine's deterministic HTML→text extraction
     (the reference ingests .txt uploads, main.py:694-729; the input_hint adds
     an ``html:binary`` column, so we define a deterministic tag-strip +
     entity-unescape followed by the reference's txt_to_markdown
     normalization).

2. **Fold oracle** — sequential application of a change-event log exactly the
   way the reference consumers do (one event at a time in (warc_ts, pos)
   order, auto_gen_rag.py:137-208 / incremental_pinecone_updater.py:204-296):
   c/u overwrite, d removes, r inserts-if-absent (Debezium snapshot phase,
   create_connector.bat:23). Used by pytest to compute golden final table
   state for any generated log.

The Spark engine never calls these in the hot path; they exist so tests can
assert byte/state equality.
"""

from __future__ import annotations

import hashlib
import re
from typing import Any

# ---------------------------------------------------------------------------
# 1. Transform oracle
# ---------------------------------------------------------------------------

_HEADING_PATTERN = r"^(#+|\d+\.)\s+(.+?)$"


def chunk_by_sections(text: str) -> list[dict[str, Any]]:
    """Chunk text by markdown sections (headings) with start & end indexes.

    Faithful port of the reference chunker (main.py:105-159). Semantics pinned
    by tests: split on '\\n'; a heading line matches ``^(#+|\\d+\\.)\\s+(.+?)$``;
    the heading line itself is included in its section's content; content is
    ``'\\n'.join(lines).strip()``; ``start_index`` is the char offset of the
    heading line; ``end_index`` of an inner section is the offset just before
    the next heading line (char_pointer - len(heading_line) - 1); the last
    section's end_index is ``len(text)``; any preamble before the first
    heading is dropped.
    """
    lines = text.split("\n")

    chunks: list[dict[str, Any]] = []
    current_title = None
    current_start = None
    section_content: list[str] = []

    char_pointer = 0

    for line in lines:
        line_len = len(line) + 1  # +1 for the newline character
        match = re.match(_HEADING_PATTERN, line)

        if match:
            if current_title and section_content:
                content = "\n".join(section_content).strip()
                end_index = char_pointer - line_len

                chunks.append(
                    {
                        "section": current_title,
                        "content": content,
                        "size": len(content),
                        "start_index": current_start,
                        "end_index": end_index,
                    }
                )

            current_title = match.group(2)
            section_content = [line]
            current_start = char_pointer
        else:
            if current_title is not None:
                section_content.append(line)

        char_pointer += line_len

    if current_title and section_content:
        content = "\n".join(section_content).strip()
        chunks.append(
            {
                "section": current_title,
                "content": content,
                "size": len(content),
                "start_index": current_start,
                "end_index": len(text),
            }
        )

    return chunks


def txt_to_markdown(text: str) -> str:
    """Normalize plain text to markdown (port of main.py:356-382).

    Line-wise: ``"1. ABC"`` → ``"## ABC"``; ``"- x"`` bullets kept; non-empty
    lines stripped and kept; blank lines kept as ``""``.
    """
    lines = text.split("\n")
    md_lines: list[str] = []

    for line in lines:
        line = line.strip()

        if re.match(r"^\d+\.\s", line):
            title = re.sub(r"^\d+\.\s", "", line)
            md_lines.append(f"## {title}")
            continue

        if line.startswith("- "):
            md_lines.append(f"- {line[2:]}")
            continue

        if line:
            md_lines.append(line)
        else:
            md_lines.append("")

    return "\n".join(md_lines)


_TAG_RE = re.compile(r"<[^>]*>")
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # last, so &amp;lt; does not double-unescape
]
_BLOCK_TAG_RE = re.compile(
    r"</?(p|div|h[1-6]|li|ul|ol|br|tr|table|section|article|header|footer)\b[^>]*>",
    re.IGNORECASE,
)


def html_to_text(html: bytes | str) -> str:
    """Deterministic HTML→text extraction (engine-defined spec).

    1. utf-8 decode (errors='replace') — mirrors the reference's upload decode
       (main.py:699-700).
    2. Block-level tags become newlines; all other tags are stripped.
    3. A fixed, ordered entity table is unescaped.
    4. The result is normalized by the reference's ``txt_to_markdown``
       (main.py:356-382) so numbered headings survive as markdown headings for
       the chunker.

    This exact function is the byte-identity oracle for the distributed
    pandas-UDF implementation in ``functions.transform``.
    """
    if isinstance(html, bytes):
        text = html.decode("utf-8", errors="replace")
    else:
        text = html
    text = _BLOCK_TAG_RE.sub("\n", text)
    text = _TAG_RE.sub("", text)
    for ent, ch in _ENTITIES:
        text = text.replace(ent, ch)
    return txt_to_markdown(text)


def content_hash(text: str) -> str:
    """md5 content hash used for change-skip / dedup keys
    (incremental_pinecone_updater.py:139-141)."""
    return hashlib.md5(text.encode("utf-8")).hexdigest()


# ---------------------------------------------------------------------------
# 2. Fold oracle
# ---------------------------------------------------------------------------


def fold_events(events: list[dict[str, Any]]) -> dict[str, dict[str, Any]]:
    """Sequentially apply a change-event log; return final table state.

    ``events`` are envelope dicts with at least ``op``, ``source`` (with
    ``pos``), and ``after``/``before`` payload dicts carrying ``url`` and
    ``warc_ts``. Application order is the total order ``(warc_ts, pos)`` of
    the payload's event time with binlog position as tie-break
    (QUICK_START.md:271-273). Semantics per op (auto_gen_rag.py:165-208):

    - ``c``/``u`` → upsert (overwrite) keyed by url
    - ``d``       → delete (key absent afterwards)
    - ``r``       → insert-if-absent (Debezium snapshot read)
    - ``t``       → TRUNCATE: clears the whole table state at its position
      (QUICK_START.md:282-288); later events rebuild it. Assumes the
      snapshot-first contract (no 'r' sorts after a 't' — Debezium snapshots
      run before streaming), matching the engine's stream>snapshot order.

    Duplicate deliveries of the same ``(file, pos)`` are idempotent: the
    second application overwrites with identical state (c/u/r) or re-deletes
    (d), so the fold is insensitive to them — matching the at-least-once
    replay contract of the engine.
    """

    def sort_key(ev: dict[str, Any]) -> tuple:
        payload = ev.get("after") or ev.get("before") or {}
        return (payload.get("warc_ts"), ev["source"]["pos"])

    state: dict[str, dict[str, Any]] = {}
    for ev in sorted(events, key=sort_key):
        op = ev["op"]
        if op == "t":
            state.clear()
            continue
        payload = ev.get("after") or ev.get("before") or {}
        url = payload.get("url")
        if url is None:
            continue
        if op in ("c", "u"):
            state[url] = dict(ev["after"])
        elif op == "r":
            if url not in state:
                state[url] = dict(ev["after"])
        elif op == "d":
            state.pop(url, None)
    return state
