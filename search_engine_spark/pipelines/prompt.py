"""Embedder prompt templates: render documents into the text a model sees.

Reference parity (P8 prompt layer): the reference renders every document
through a template before embedding it (``/root/reference/src/prompt/mod.rs``
builds a Liquid template with a document context; ``template_checker.rs``
validates the template against the document schema at settings time, and
rendering truncates to the embedder's prompt byte budget). This module is
the deterministic PySpark re-expression:

* ``{{field}}`` placeholders (``{{doc.field}}`` also accepted, matching the
  reference's document context) substitute document columns;
* :meth:`PromptTemplate.check` validates referenced fields against a
  DataFrame schema up front — the ``template_checker`` analogue, so a bad
  template fails at plan time, not per-row at execute time;
* missing/NULL field values render as the empty string (the reference's
  nil-value rendering);
* ``max_chars`` truncates the rendered prompt (the reference truncates to
  the embedder's configured prompt size);
* :meth:`PromptTemplate.column` renders JVM-side — one whole-stage-codegen
  ``concat`` over the referenced columns, zero Python in the hot path; the
  Python :meth:`render` mirror exists for serving paths and tests.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

_FIELD_RE = re.compile(r"\{\{\s*(?:doc\.)?([A-Za-z_][A-Za-z0-9_]*)\s*\}\}")


class PromptTemplate:
    """``"{{title}}: {{body}}"``-style template over document columns.

    Segments alternate literal text and field references; both the Spark
    column rendering and the Python rendering are pure functions of the
    row, so the DuckDB oracle reproduces prompts with a ``concat``.
    """

    def __init__(self, template: str, max_chars: int | None = None):
        self.template = template
        self.max_chars = max_chars
        self._segments: list[tuple[str, str]] = []
        pos = 0
        for m in _FIELD_RE.finditer(template):
            if m.start() > pos:
                self._segments.append(("lit", template[pos:m.start()]))
            self._segments.append(("field", m.group(1)))
            pos = m.end()
        if pos < len(template):
            self._segments.append(("lit", template[pos:]))
        if not any(k == "field" for k, _ in self._segments):
            raise ValueError(
                f"prompt template references no {{{{field}}}}: {template!r}"
            )

    def fields(self) -> list[str]:
        """Referenced field names, in order of first appearance."""
        out: list[str] = []
        for k, v in self._segments:
            if k == "field" and v not in out:
                out.append(v)
        return out

    def check(self, df: DataFrame) -> None:
        """Validate against a document schema (template_checker parity):
        every referenced field must be a column."""
        missing = [f for f in self.fields() if f not in df.columns]
        if missing:
            raise ValueError(
                f"prompt template references missing document fields "
                f"{missing}; available: {sorted(df.columns)}"
            )

    def column(self) -> Column:
        """JVM-side rendering: one codegen ``concat`` (NULL -> '')."""
        parts = [
            F.lit(v) if k == "lit"
            else F.coalesce(F.col(v).cast("string"), F.lit(""))
            for k, v in self._segments
        ]
        col = parts[0] if len(parts) == 1 else F.concat(*parts)
        if self.max_chars is not None:
            col = F.substring(col, 1, self.max_chars)
        return col

    def render(self, row: dict) -> str:
        """Python mirror of :meth:`column` for serving paths and tests."""
        out = "".join(
            v if k == "lit"
            else ("" if row.get(v) is None else str(row[v]))
            for k, v in self._segments
        )
        return out[: self.max_chars] if self.max_chars is not None else out
