"""Physical-plan audit: capture ``explain("formatted")`` for every
registered query and grade it against the scale checklist.

Writes PLANS.md — one section per query with:

* operator census — joins, exchanges, aggregates, Python-eval nodes;
* per-scan ``PushedFilters`` / ``ReadSchema`` (is pruning reaching parquet?);
* red flags: CartesianProduct, row-at-a-time ``BatchEvalPython`` (the
  Arrow-batched ``ArrowEvalPython``/``MapInPandas`` are the fast path),
  SortMergeJoin where a broadcast was expected, scans reading every column.

Usage: python tools/explain_audit.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import contextlib
import io
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from hybrid_vector_search_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

OPERATOR_PATTERNS = {
    "broadcast_joins": r"BroadcastHashJoin|BroadcastNestedLoopJoin",
    "sortmerge_joins": r"SortMergeJoin",
    "shuffle_exchanges": r"\bExchange\b(?!.*Broadcast)",
    "broadcast_exchanges": r"BroadcastExchange",
    "hash_aggregates": r"HashAggregate",
    "sorts": r"\bSort\b",
    "window": r"\bWindow\b|RunningWindowFunction",
    "take_ordered": r"TakeOrderedAndProject",
    "arrow_python": r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas",
    "row_python": r"BatchEvalPython",
    "cartesian": r"CartesianProduct",
    "expand": r"\bExpand\b",
}


def audit_plan(text: str) -> tuple[dict[str, int], list[str], list[dict]]:
    # census over the plan TREE only — the numbered details section below
    # it repeats every operator and would double-count
    tree = text.split("\n\n(1)")[0]
    counts = {
        k: len(re.findall(p, tree)) for k, p in OPERATOR_PATTERNS.items()
    }
    scans = []
    for m in re.finditer(
        r"Scan parquet.*?Location.*?\[(?:file:)?([^\]]+)\].*?"
        r"(?:PartitionFilters: \[([^\]]*)\].*?)?"
        r"(?:PushedFilters: \[([^\]]*)\])?\s*ReadSchema: (\S+)",
        text,
        re.S,
    ):
        path, part, pushed, schema = m.groups()
        scans.append(
            {
                "table": Path(path.split(",")[0]).name,
                "partition": (part or "").strip(),
                "pushed": (pushed or "").strip(),
                "read_schema": schema.strip(),
            }
        )
    flags = []
    if counts["cartesian"]:
        flags.append("CARTESIAN PRODUCT — quadratic; must be intentional")
    if counts["row_python"]:
        flags.append(
            "BatchEvalPython (row-at-a-time Python UDF) — use pandas_udf"
        )
    return counts, flags, scans


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filters = sys.argv[2:]
    spark = get_spark("explain_audit")

    qs = entrymod.queries()
    if name_filters:
        qs = {k: v for k, v in qs.items() if any(f in k for f in name_filters)}

    lines = [
        "# Physical-plan audit",
        "",
        f"`explain(formatted)` for every registered query at `{sf_dir}`,",
        "graded for scale discipline (pushdown, pruning, broadcast, Arrow).",
        "Regenerate: `python tools/explain_audit.py`.",
        "",
    ]
    summary_rows = []
    for name, fn in sorted(qs.items()):
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # pragma: no cover
            lines += [f"## {name}", "", f"ERROR building plan: {e}", ""]
            continue
        counts, flags, scans = audit_plan(text)
        census = ", ".join(
            f"{k}={v}" for k, v in counts.items() if v and k != "cartesian"
        )
        summary_rows.append(
            (name, counts["shuffle_exchanges"], counts["broadcast_joins"],
             counts["sortmerge_joins"], counts["arrow_python"],
             "⚠ " + "; ".join(flags) if flags else "ok")
        )
        lines += [f"## {name}", "", f"census: {census or '(scan only)'}", ""]
        for s in scans:
            part = (
                f" — partition-pruned: `{s['partition']}`"
                if s.get("partition")
                else ""
            )
            lines.append(
                f"- scan `{s['table']}`{part}"
                f" — pushed: `{s['pushed'] or 'none'}`"
                f" — reads: `{s['read_schema']}`"
            )
        for fl in flags:
            lines.append(f"- **FLAG**: {fl}")
        lines.append("")

    lines += ["## Summary", "", "| query | shuffles | bcast joins | smj | arrow | verdict |", "|---|---|---|---|---|---|"]
    for r in summary_rows:
        lines.append("| " + " | ".join(str(x) for x in r) + " |")
    lines.append("")

    out = REPO / "PLANS.md"
    out.write_text("\n".join(lines))
    n_flagged = sum(1 for r in summary_rows if r[-1] != "ok")
    print(f"wrote {out} — {len(summary_rows)} plans, {n_flagged} flagged")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
