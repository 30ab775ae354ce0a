"""Round-over-round bench regression check.

Compares two bench JSON artifacts (the full ``BENCH_local.json`` shape,
or the compact final-stdout-line shape — both carry ``queries``) and
prints per-query deltas beyond a threshold plus the headline-rate
movements, so "zero regressions > 25%" is a command, not an eyeball:

    python scripts/bench_compare.py BENCH_prev.json BENCH_local.json
    python scripts/bench_compare.py --threshold 0.10 old.json new.json

Reads the PREVIOUS round's artifact from git when asked:

    git show r04-tag:BENCH_local.json > /tmp/prev.json

Exit code 1 when any query regresses past the threshold (CI-able).
Queries present in only one file are listed but never counted as
regressions (the headline set is allowed to grow).
"""

from __future__ import annotations

import argparse
import json
import sys

RATE_KEYS = (
    # (path in the full artifact, compact-line key, higher-is-better)
    (("spo_ingest", "rows_per_sec"), "spo_rows_per_sec", True),
    (("streaming_ingest", "rows_per_sec"), "streaming_rows_per_sec", True),
    (("streaming_dedup", "docs_per_sec"), "dedup_docs_per_sec", True),
    (("cc_distributed", "sec"), "cc_sec", False),
)


def _rate(doc: dict, path: tuple[str, str], compact_key: str):
    node = doc.get(path[0])
    if isinstance(node, dict) and path[1] in node:
        return node[path[1]]
    return doc.get(compact_key)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=0.25)
    args = ap.parse_args()

    with open(args.old) as f:
        old = json.load(f)
    with open(args.new) as f:
        new = json.load(f)
    if old.get("sf") != new.get("sf"):
        print(
            f"WARNING: scale factors differ (old sf={old.get('sf')}, "
            f"new sf={new.get('sf')}) — deltas are not comparable",
            file=sys.stderr,
        )

    qo, qn = old.get("queries", {}), new.get("queries", {})
    regressions = []
    for name in sorted(qn):
        if name not in qo:
            print(f"  NEW    {name}: {qn[name]:.2f}s (no previous sample)")
            continue
        prev, cur = qo[name], qn[name]
        if not prev:
            # a 0.00s previous sample is a recording artifact, not a
            # baseline — surface it instead of treating delta as 0
            print(f"  ODD    {name}: previous sample {prev}s — not comparable")
            continue
        delta = (cur - prev) / prev
        if delta > args.threshold:
            regressions.append((name, prev, cur, delta))
        elif delta < -args.threshold:
            print(f"  FASTER {name}: {prev:.2f}s -> {cur:.2f}s ({delta:+.0%})")
    for name in sorted(set(qo) - set(qn)):
        print(f"  GONE   {name}: was {qo[name]:.2f}s")

    for path, ck, higher in RATE_KEYS:
        a, b = _rate(old, path, ck), _rate(new, path, ck)
        if a and b:
            d = (b - a) / a
            word = "up" if d > 0 else "down"
            bad = d != 0 and (d > 0) != higher
            print(f"  RATE   {ck}: {a:,.1f} -> {b:,.1f} ({word} {abs(d):.0%}"
                  f"{' — WORSE' if bad else ''})")
            # rate regressions gate the exit code like query times do
            if bad and abs(d) > args.threshold:
                regressions.append((ck, a, b, d))

    total_o, total_n = old.get("value"), new.get("value")
    if total_o and total_n:
        print(f"  TOTAL  {total_o:.2f}s -> {total_n:.2f}s "
              f"({(total_n - total_o) / total_o:+.1%}; set "
              f"{len(qo)} -> {len(qn)} queries)")

    if regressions:
        print(f"\n{len(regressions)} regression(s) > {args.threshold:.0%}:")
        for name, prev, cur, delta in regressions:
            unit = "" if name in {ck for _, ck, _ in RATE_KEYS} else "s"
            print(f"  REGRESS {name}: {prev:,.2f}{unit} -> {cur:,.2f}{unit} "
                  f"({delta:+.0%})")
        return 1
    print(f"\nno per-query or rate regressions > {args.threshold:.0%}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
