"""Automatic driver-exposure rotation from correctness artifacts.

The correctness driver evaluates a ~50-query prefix of ``queries()``
in dict order, once per round, and records per-query verdicts in
``CORRECTNESS_r{NN}.json``.  With a catalog several times larger than
the prefix, the ordering policy is FRESHNESS: re-certify the queries
whose most recent green driver row is oldest, so every row in the
rolling union stays as few rounds old as the prefix size allows.

Through round 5 this ordering was a hand-maintained list re-derived
from the artifacts each round — a per-round maintenance step with
per-round opportunity for error.  This module computes it instead,
directly from the committed ``CORRECTNESS_r*.json`` files, so the
rotation is routine: each new round's artifact lands in the repo and
the NEXT round's exposure order shifts automatically.

Policy (encoding exactly the hand rotation used in rounds 4-5):

1. Provable queries (an oracle is registered) come first, ordered by
   the round of their freshest GREEN row ascending — never-certified
   queries (new additions, or rows that have only ever failed) sort
   before everything, then the stalest certified rows.  Ties break by
   name, which is deterministic across registration-order churn.
2. Rows-only-by-design queries (``oracle=None`` in the registry) are
   pinned after every provable query, staleness-ordered among
   themselves: their weaker rows-only check must never displace a
   provable query from the checked prefix.

A row counts as GREEN when rows/schema/hash all matched with no error;
a rows-only row counts when the driver recorded a row count without an
execution error (``err == 'no_oracle'`` is the driver's marker for the
weaker check, not a failure).  A query that FAILED in its latest
exposure keeps the round of its last green row (or none), so failures
re-queue near the front automatically.
"""

from __future__ import annotations

import glob
import json
import os
import re

ARTIFACT_GLOB = "CORRECTNESS_r*.json"
_ROUND_RE = re.compile(r"CORRECTNESS_r(\d+)\.json$")


def _row_is_green(row: dict) -> bool:
    """Hash-green: the full rows+schema+values certification."""
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match")
        and not row.get("err")
    )


def _row_is_rows_only_ok(row: dict) -> bool:
    """The driver's weaker no-oracle check: it ran the Spark side and
    recorded a row count; 'no_oracle' is a marker, not an error."""
    return row.get("err") in (None, "no_oracle") and row.get("spark_rows") is not None


def freshest_green(repo_dir: str) -> dict[str, int]:
    """Map query name -> highest round with a green (or, for rows-only
    rows, rows-only-ok) verdict, across every committed artifact.
    Unreadable/corrupt artifacts are skipped: a broken file must not
    take the driver contract down with it."""
    out: dict[str, int] = {}
    for path in glob.glob(os.path.join(repo_dir, ARTIFACT_GLOB)):
        m = _ROUND_RE.search(os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                doc = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(doc, dict):
            continue
        for name, row in doc.items():
            if not isinstance(row, dict):
                continue
            if _row_is_green(row) or (
                row.get("hash_match") is None and _row_is_rows_only_ok(row)
            ):
                if rnd > out.get(name, 0):
                    out[name] = rnd
    return out


def exposure_order(
    names: list[str],
    provable: dict[str, bool],
    freshness: dict[str, int],
) -> list[str]:
    """Order ``names`` for driver exposure per the module policy.

    ``provable[name]`` — whether the query registers an oracle (design
    rows-only queries are pinned after all provable ones).
    ``freshness[name]`` — round of freshest green evidence; absent =
    never certified (sorts first within its provability class).
    """
    return sorted(
        names,
        key=lambda n: (not provable.get(n, True), freshness.get(n, 0), n),
    )
