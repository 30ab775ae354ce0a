"""Physical-plan inspection: make "is this the plan you'd want at
100 TB?" a testable property instead of a code-review opinion.

The reference engine has no plan at all (a fixed, hand-fused C++
pipeline — SURVEY §4); on Spark the plan IS the performance contract, so
we pin the load-bearing properties per query in tests/test_plans.py:

* filters reach the parquet scan (``PushedFilters``),
* scans read only the projected columns (``ReadSchema``),
* dimension joins broadcast (no fact-side shuffle),
* aggregations are partial+final (map-side combine),
* global top-k compiles to TakeOrdered (per-partition heaps), never a
  global sort,
* shuffle (Exchange) counts don't silently regress.

All helpers parse ``explain("formatted")`` / executedPlan text — the
same strings a human reads — so assertions survive Spark version bumps
better than internal-API visitors would.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The executed (post-AQE-planning) physical plan as text."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def exchange_count(df: DataFrame) -> int:
    """Number of DATA-SIZED shuffle exchanges: hash partitioning, range
    partitioning, and single-partition collection.  Deliberately
    excluded: broadcast exchanges (they ship a dimension, not the fact)
    and round-robin repartitions (only emitted by ensure_min_splits,
    whose contract is to be a no-op whenever input splits ≥ cores —
    i.e. always, at scale)."""
    plan = simple_plan(df)
    return len(
        re.findall(
            r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)",
            plan,
        )
    )


def broadcast_join_count(df: DataFrame) -> int:
    return simple_plan(df).count("BroadcastHashJoin")


def _split_top_level(text: str) -> list[str]:
    """Split a filter/field list on commas NOT inside (), [], or type
    applications like ``struct<...>`` — a naive split mangles
    ``In(col, [a,b])`` and ``decimal(18,4)`` into garbage fragments.

    ``<``/``>`` are bracket-counted ONLY when the ``<`` immediately
    follows a TYPE keyword (``array<``, ``map<``, ``struct<``) AND the
    next character continues an identifier (alnum/underscore — struct
    field names may start with a DIGIT via CSV headers, so requiring a
    letter would mis-split ``struct<1a:int,b:string>``): a
    follows-a-word-character heuristic would treat the infix comparison
    in a spaceless plan fragment (``(x#1<5)``) as an opener whose ``>``
    never arrives, permanently disabling comma splitting for the rest
    of the payload.  The residual false-open — a column literally NAMED
    ``array``/``map``/``struct`` with no ``#exprId`` suffix compared
    spacelessly to a value — cannot occur in Spark-rendered plan
    payloads (columns carry ``#exprId``, which resets the word
    tracker at ``#``; pushed filters render functionally,
    ``GreaterThan(col, 5)``).  Closers only decrement when an opener
    is outstanding (depth never goes negative), and lambda arrows
    (``->``) are ignored.  Two guards catch a false-open that survives
    the keyword heuristic (a column literally NAMED ``array``/``map``/
    ``struct`` spacelessly ``<``-compared to a value):

    * paren containment — a genuine type application never spans a
      ``)``/``]`` closing a bracket opened BEFORE its ``<``, so a
      closer that would drop the paren depth below the depth recorded
      at the innermost outstanding opener proves that opener was a
      comparison (``(struct<5), a`` — the ``)`` arrives with the
      angle still open);
    * end-of-text rebalance — any opener still outstanding when the
      scan ends was a comparison whose ``>`` never arrived.

    Either way the scan disables that opener and restarts, so one bad
    ``<`` never suppresses comma splitting for the rest of the payload
    while genuine type applications elsewhere in the same payload
    still bracket-count.  Residual miss (accepted): a false opener
    with no enclosing paren whose suppressed span contains a later
    bare ``>`` — Spark-rendered payloads can't produce it (columns
    carry ``#exprId``, which resets the word tracker)."""
    type_words = ("array", "map", "struct")
    disabled: set[int] = set()
    while True:
        out: list[str] = []
        cur: list[str] = []
        depth = angle = 0
        open_stack: list[tuple[int, int]] = []  # (index, paren depth at open)
        bad: int | None = None
        word: list[str] = []
        prev = ""
        for i, ch in enumerate(text):
            nxt = text[i + 1] if i + 1 < len(text) else ""
            if ch in "([":
                depth += 1
            elif ch in ")]":
                depth -= 1
                if open_stack and depth < open_stack[-1][1]:
                    # closes a paren opened before the innermost '<':
                    # that opener was a comparison, not a type app
                    bad = open_stack[-1][0]
                    break
            elif (
                ch == "<"
                and i not in disabled
                and "".join(word).lower() in type_words
                and (nxt.isalnum() or nxt == "_")
            ):
                angle += 1
                open_stack.append((i, depth))
            elif ch == ">" and angle > 0 and prev != "-":
                angle -= 1
                open_stack.pop()
            if ch.isalnum() or ch == "_":
                word.append(ch)
            else:
                word.clear()
            if ch == "," and depth == 0 and angle == 0:
                out.append("".join(cur).strip())
                cur = []
            else:
                cur.append(ch)
            prev = ch
        if bad is None and open_stack:
            # end-of-text with openers outstanding: earliest was false
            bad = open_stack[0][0]
        if bad is None:
            break
        # disable the proven-false opener and rescan (terminates: each
        # pass permanently removes one opener)
        disabled.add(bad)
    if cur:
        out.append("".join(cur).strip())
    return [s for s in out if s]


def _bracket_payload(block: str, label: str) -> str | None:
    """The text between ``label: [`` and its MATCHING ``]`` (bracket-
    counted — a first-']' regex truncates nested lists like In(...))."""
    start = block.find(f"{label}: [")
    if start < 0:
        return None
    i = start + len(label) + 3
    depth = 1
    for j in range(i, len(block)):
        if block[j] == "[":
            depth += 1
        elif block[j] == "]":
            depth -= 1
            if depth == 0:
                return block[i:j]
    return None


def pushed_filters(df: DataFrame, table_hint: str = "") -> list[str]:
    """All PushedFilters entries (optionally only scans whose text
    mentions ``table_hint``, e.g. the parquet file name)."""
    out: list[str] = []
    blocks = re.split(r"\(\d+\) Scan parquet", formatted_plan(df))[1:]
    for b in blocks:
        if table_hint and table_hint not in b.split("PushedFilters", 1)[0]:
            continue
        payload = _bracket_payload(b, "PushedFilters")
        if payload and payload.strip():
            out.extend(_split_top_level(payload))
    return out


def read_schema_columns(df: DataFrame, table_hint: str) -> set[str]:
    """Column names every scan of ``table_hint`` reads, UNIONED across
    scans — a self-joined table scanned twice must report both scans'
    columns, or a pruning assertion can pass against the narrow one."""
    cols: set[str] = set()
    blocks = re.split(r"\(\d+\) Scan parquet", formatted_plan(df))[1:]
    for b in blocks:
        head = b.split("PushedFilters", 1)[0]
        if table_hint in head:
            # greedy to the LAST '>' on the line: nested types
            # (struct<...>, array<...>) contain '>' themselves
            sm = re.search(r"ReadSchema: struct<(.*)>", b)
            if sm:
                cols |= {
                    p.split(":", 1)[0].strip()
                    for p in _split_top_level(sm.group(1))
                }
    return cols


def partition_filters(df: DataFrame) -> list[str]:
    """All PartitionFilters entries across parquet scans — non-empty
    means partition pruning is happening at planning time (files of
    non-matching partitions are never opened)."""
    out: list[str] = []
    plan = formatted_plan(df)
    for m in re.finditer(r"PartitionFilters: \[", plan):
        payload = _bracket_payload(plan[m.start() :], "PartitionFilters")
        if payload and payload.strip():
            out.extend(_split_top_level(payload))
    return out


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Count of WholeStageCodegen regions — wider/fewer is better.
    ``toString()`` renders a region as ``*(N) Operator``."""
    plan = simple_plan(df)
    ids = set(re.findall(r"\*\((\d+)\)", plan))
    ids |= set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    return len(ids)
