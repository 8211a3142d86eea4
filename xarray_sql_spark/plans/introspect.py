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


def pure_scan_payload(df: DataFrame) -> str | None:
    """The ``payload`` option of the single scan of a pure-scan plan, or
    None. Callers use it to verify the plan scans the SAME registered
    grid they resolved coordinates from — purity alone is not identity
    (a session can hold one registered grid plus unrelated V2 tables,
    and a pure scan of one of those must not borrow the grid's axes)."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        payloads: list = []
        for n in _walk(plan):
            cls = n.getClass().getSimpleName()
            if cls == "DataSourceV2ScanRelation":
                try:
                    payloads.append(n.relation().options().get("payload"))
                except Exception:
                    payloads.append(None)
            elif cls not in PURE_SCAN_NODES:
                return None
        if len(payloads) == 1 and payloads[0]:
            return payloads[0]
        return None
    except Exception:
        return None


def pure_scan_passthrough(df: DataFrame) -> tuple[str, set[str]] | None:
    """(payload, result columns that ARE the scan's own output attributes)
    for a pure-scan plan, else None.

    Purity alone does not make a result column safe to resolve from source
    coordinates: ``SELECT time + INTERVAL 1 HOUR AS time, ...`` is still
    Project-over-scan, but its ``time`` is a COMPUTED alias (fresh exprId)
    whose values no longer equal the source axis. Only columns whose
    exprId appears verbatim in the scan output pass through unchanged —
    Project/Sort/SubqueryAlias all preserve exprIds for bare attributes,
    and every alias (even a pure rename) mints a new one, which is the
    conservative side."""
    try:
        payload = pure_scan_payload(df)
        if payload is None:
            return None
        plan = df._jdf.queryExecution().optimizedPlan()
        scan_ids: set[int] = set()
        for n in _walk(plan):
            if n.getClass().getSimpleName() == "DataSourceV2ScanRelation":
                it = n.output().iterator()
                while it.hasNext():
                    scan_ids.add(it.next().exprId().id())
        passthrough: set[str] = set()
        it = plan.output().iterator()
        while it.hasNext():
            a = it.next()
            if a.exprId().id() in scan_ids:
                passthrough.add(a.name())
        return (payload, passthrough)
    except Exception:
        return None


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


def metadata_aggregate_spec(df: DataFrame, payload_keys):
    """If the optimized plan is a global (group-less) aggregate of only
    MIN/MAX/COUNT over a single grid scan's DIM columns, return
    ``(payload, [(out_name, kind, dim)], preds)`` where kind is
    'min' | 'max' | 'count_star' | 'count' and ``preds`` is the list of
    per-dim filter conjuncts as (dim, op, [(value, typename)]) — empty
    for an unfiltered scan; a filter is accepted (for counts AND
    min/max, which the caller answers from per-dim coordinate masks)
    only when every conjunct is a simple comparison / IN / IsNotNull on
    one scan column. Else None.

    This is the DataFusion-style statistics-aggregate shortcut (the
    reference answers COUNT(*) from exact scan stats; dim coords are
    driver-known, so their MIN/MAX are too). exprId-precise: MIN over an
    attribute merely *named* like a dim (e.g. an aliased expression in a
    subquery) does not match — the attribute must be the scan's own
    output column.
    """
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        if plan.getClass().getSimpleName() != "Aggregate":
            return None
        if not plan.groupingExpressions().isEmpty():
            return None
        scan = None
        filters = []
        n_aggs = 0
        for n in _walk(plan):
            cls = n.getClass().getSimpleName()
            if cls == "DataSourceV2ScanRelation":
                if scan is not None:
                    return None
                scan = n
            elif cls == "Filter":
                filters.append(n)
            elif cls == "Aggregate":
                # the ROOT aggregate only: a nested Aggregate (DISTINCT /
                # GROUP BY subquery) changes the row set the outer
                # aggregate sees, so the dim-product answer is wrong
                n_aggs += 1
                if n_aggs > 1:
                    return None
            elif cls != "Project":
                return None
        if scan is None:
            return None
        payload = scan.relation().options().get("payload")
        if payload not in payload_keys:
            return None
        scan_cols: dict[int, str] = {}
        it = scan.output().iterator()
        while it.hasNext():
            a = it.next()
            scan_cols[a.exprId().id()] = a.name()

        def _scan_attr(expr):
            """Scan-output column name for a (possibly cast-free)
            AttributeReference, else None."""
            if expr.getClass().getSimpleName() != "AttributeReference":
                return None
            return scan_cols.get(expr.exprId().id())

        spec = []
        aggs = plan.aggregateExpressions()
        for i in range(aggs.size()):
            ne = aggs.apply(i)
            if ne.getClass().getSimpleName() != "Alias":
                return None
            child = ne.child()
            if child.getClass().getSimpleName() != "AggregateExpression":
                return None
            if child.isDistinct() or child.filter().isDefined():
                return None
            fn = child.aggregateFunction()
            fcls = fn.getClass().getSimpleName()
            ch = fn.children()
            if fcls == "Count":
                if ch.size() == 1 and ch.apply(0).getClass().getSimpleName() == "Literal":
                    # COUNT(<non-null literal>) is COUNT(*); COUNT(NULL) is
                    # 0 and must NOT be answered with the cell count — fall
                    # back to the engine for it.
                    if ch.apply(0).value() is None:
                        return None
                    spec.append((ne.name(), "count_star", None))
                    continue
                if ch.size() == 1:
                    dim = _scan_attr(ch.apply(0))
                    if dim is not None:
                        spec.append((ne.name(), "count", dim))
                        continue
                return None
            if fcls in ("Min", "Max"):
                dim = _scan_attr(ch.apply(0))
                if dim is None:
                    return None
                spec.append((ne.name(), fcls.lower(), dim))
                continue
            return None
        if filters:
            # Per-dim masks express the filtered cross-product exactly:
            # count = product of per-dim match counts, and (when the
            # product is non-zero) min/max(dim) = the masked coord
            # extremes. Every conjunct must be a simple per-dim predicate.
            preds = []
            for f in filters:
                if not _conjuncts(f.condition(), _scan_attr, preds):
                    return None
            return (payload, spec, preds)
        return (payload, spec, [])
    except Exception:
        return None


_CMP_CLASSES = {
    "GreaterThan": ">",
    "GreaterThanOrEqual": ">=",
    "LessThan": "<",
    "LessThanOrEqual": "<=",
    "EqualTo": "=",
}
_FLIP = {">": "<", ">=": "<=", "<": ">", "<=": ">=", "=": "="}


def _literal_py(expr):
    """(python value, spark type name) for a Literal, else None."""
    if expr.getClass().getSimpleName() != "Literal":
        return None
    v = expr.value()
    t = expr.dataType().typeName()
    if v is None:
        return None
    if t in ("timestamp", "timestamp_ntz"):
        return (int(v), t)  # microseconds since epoch
    if t in ("integer", "long", "short", "byte"):
        return (int(v), t)
    if t in ("double", "float"):
        return (float(v), t)
    if t == "date":
        return (int(v), t)  # days since epoch
    if t == "string":
        return (str(v), t)
    return None


def _conjuncts(cond, scan_attr, out) -> bool:
    """Flatten an And-tree of simple per-dim predicates into
    ``out`` as (dim, op, [values]) tuples. False if anything in the tree
    is not expressible (caller must bail to the engine)."""
    cls = cond.getClass().getSimpleName()
    if cls == "And":
        return _conjuncts(cond.left(), scan_attr, out) and _conjuncts(
            cond.right(), scan_attr, out
        )
    if cls == "IsNotNull":
        dim = scan_attr(cond.child())
        if dim is None:
            return False
        out.append((dim, "notnull", []))
        return True
    if cls in _CMP_CLASSES:
        left, right = cond.left(), cond.right()
        dim, lit, op = scan_attr(left), _literal_py(right), _CMP_CLASSES[cls]
        if dim is None:  # maybe literal <op> attr: flip
            dim, lit, op = scan_attr(right), _literal_py(left), _FLIP[_CMP_CLASSES[cls]]
        if dim is None or lit is None:
            return False
        out.append((dim, op, [lit]))
        return True
    if cls == "In":
        dim = scan_attr(cond.value())
        if dim is None:
            return False
        vals = []
        lst = cond.list()
        for i in range(lst.size()):
            lit = _literal_py(lst.apply(i))
            if lit is None:
                return False
            vals.append(lit)
        out.append((dim, "in", vals))
        return True
    if cls == "InSet":
        # optimizer turns large In-lists into InSet with raw values;
        # their element conversion is type-dependent — bail for now
        return False
    return False
