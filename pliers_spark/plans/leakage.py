"""Temporal-leakage linter over Window specs (SURVEY.md §7.2).

North rule: zero temporal leakage — no feature may read rows with
``warc_ts`` greater than its own. Every leakage-safe frame therefore
ends at ``currentRow``; the only sanctioned future access is an
**explicit** ``lead`` feature, which must be flagged by the caller.

This module audits a built DataFrame's *optimized logical plan* (i.e.
what will actually execute, after Catalyst rewrites) rather than the
Python code that built it: any Window frame whose upper bound reaches
past the current row is reported, attributed to its output column.
Frame text shapes handled (from Spark's plan printer):

    specifiedwindowframe(RowFrame,  unboundedpreceding$(), currentrow$())   safe
    specifiedwindowframe(RangeFrame, -604800, currentrow$())                safe
    specifiedwindowframe(RowFrame,  -1, -1)                                 safe (lag)
    specifiedwindowframe(RowFrame,   2,  2)                                 future (lead)
    specifiedwindowframe(RowFrame,  currentrow$(), 5)                       future
    specifiedwindowframe(RowFrame,  currentrow$(), unboundedfollowing$())   future

Run it as a build-time gate: ``assert_leakage_free(df, allow_lead=
{"next_val"})`` in the pipeline that assembles feature frames.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

_FRAME_RE = re.compile(
    r"specifiedwindowframe\((RowFrame|RangeFrame),\s*([^,]+?),\s*([^,()]+(?:\(\))?)\)\)\s*AS\s*(\w+)#"
)
_OFFSET_FN_RE = re.compile(r"\b(lag|lead)\(")


class LeakageError(AssertionError):
    pass


@dataclass
class Finding:
    column: str
    kind: str  # 'lead' (explicit offset fn) | 'future_frame'
    frame: str


def _upper_reads_future(bound: str) -> bool:
    b = bound.strip().lower()
    if "following" in b:
        return True
    if "currentrow" in b or "unboundedpreceding" in b:
        return False
    try:
        return int(b) > 0
    except ValueError:
        # unknown token (e.g. an interval literal): future unless negative
        return not b.startswith("-")


def audit_window_frames(df: DataFrame) -> list[Finding]:
    """All window frames in the optimized plan that read future rows."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    findings: list[Finding] = []
    prev_end = 0
    for m in _FRAME_RE.finditer(plan):
        frame_type, lower, upper, out_col = m.groups()
        if _upper_reads_future(upper):
            segment = plan[prev_end : m.start()]
            fns = _OFFSET_FN_RE.findall(segment)
            kind = "lead" if fns and fns[-1] == "lead" else "future_frame"
            findings.append(
                Finding(out_col, kind, f"{frame_type}({lower.strip()}, {upper.strip()})")
            )
        prev_end = m.end()
    return findings


def assert_leakage_free(df: DataFrame, allow_lead=()) -> None:
    """Raise LeakageError unless every window frame ends at or before
    currentRow, excepting ``lead`` features whose output column is
    explicitly listed in ``allow_lead`` (or allow_lead is True)."""
    bad = []
    for f in audit_window_frames(df):
        if f.kind == "lead" and (allow_lead is True or f.column in set(allow_lead)):
            continue
        bad.append(f)
    if bad:
        detail = "; ".join(f"{f.column}: {f.kind} {f.frame}" for f in bad)
        raise LeakageError(f"window frames read future rows: {detail}")
