"""Catalyst logical-plan introspection (JVM plan walks via py4j).

No custom Catalyst rules are needed for parity (SURVEY.md §4) — but two
*read-only* plan walks are: the projection-pushdown compensation needs to
know which columns each grid scan actually feeds (Spark 4.1 doesn't column-
prune Python data sources), and the reverse pivot's coordinate fast path
needs to know whether a plan is a pure unfiltered scan (reference
ds.py:435-505 walks DataFusion's logical plan the same way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

PURE_SCAN_NODES = {"Project", "Sort", "SubqueryAlias", "DataSourceV2ScanRelation"}


def _walk(plan):
    stack = [plan]
    while stack:
        n = stack.pop()
        yield n
        ch = n.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
        try:
            sq = n.subqueries()
            for i in range(sq.size()):
                stack.append(sq.apply(i))
        except Exception:
            pass


def is_pure_scan(df: DataFrame) -> bool:
    """True iff the optimized plan is a single unfiltered table scan under
    only {Project, Sort, SubqueryAlias} — the case where result coordinates
    provably equal the source's (A12 fast path)."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        n_scans = 0
        for n in _walk(plan):
            cls = n.getClass().getSimpleName()
            if cls == "DataSourceV2ScanRelation":
                n_scans += 1
            elif cls not in PURE_SCAN_NODES:
                return False
        return n_scans == 1
    except Exception:
        return False


def referenced_scan_columns(df: DataFrame, payload_keys) -> dict[str, set[str]]:
    """Map payload key -> columns of that grid scan actually referenced by
    the optimized plan (exprId-precise, so duplicate column names across
    tables are safe). Drives projection pushdown to storage (A3)."""
    plan = df._jdf.queryExecution().optimizedPlan()
    nodes = list(_walk(plan))
    refs: set[int] = set()
    for n in nodes:
        it = n.references().iterator()
        while it.hasNext():
            refs.add(it.next().exprId().id())
    it = plan.output().iterator()
    while it.hasNext():
        refs.add(it.next().exprId().id())
    needed: dict[str, set[str]] = {}
    for n in nodes:
        if n.getClass().getSimpleName() != "DataSourceV2ScanRelation":
            continue
        try:
            payload = n.relation().options().get("payload")
        except Exception:
            continue
        if payload not in payload_keys:
            continue
        cols = needed.setdefault(payload, set())
        out_it = n.output().iterator()
        while out_it.hasNext():
            a = out_it.next()
            if a.exprId().id() in refs:
                cols.add(a.name())
    return needed
