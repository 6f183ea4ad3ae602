#!/usr/bin/env python3
"""Merge re-measured rows into a screen artifact.

The standing per-round screen (tools/screen_sf1.sh -> SCREEN_SF1_r<N>.json)
occasionally needs individual rows re-measured — a watchdog timeout under
host contention, or a query added mid-round. This folds the rows of one or
more fix-up screen JSONs into the base artifact (by query name, fix-up
wins), recomputes the summary counts, and rewrites the base in place.

Usage: tools/screen_merge.py <base.json> <fix1.json> [fix2.json ...]
"""
import json
import sys


def main() -> None:
    base_path, fixes = sys.argv[1], sys.argv[2:]
    with open(base_path) as f:
        base = json.load(f)
    rows = {r["query"]: r for r in base["rows"]}
    for fp in fixes:
        with open(fp) as f:
            fix = json.load(f)
        for r in fix["rows"]:
            rows[r["query"]] = r
    merged = sorted(rows.values(), key=lambda r: r["query"])
    base["rows"] = merged
    base["n_queries"] = len(merged)
    base["n_flagged"] = sum(1 for r in merged if r["status"] == "flagged")
    base["n_failed"] = sum(
        1 for r in merged if r["status"] in ("failed", "timeout"))
    with open(base_path, "w") as f:
        json.dump(base, f, indent=None, separators=(",", ":"))
        f.write("\n")
    print(f"merged {len(fixes)} fix file(s) -> {base_path}: "
          f"{base['n_queries']} rows, {base['n_flagged']} flagged, "
          f"{base['n_failed']} failed")


if __name__ == "__main__":
    main()
