"""Snapshot registered-query results for before/after equivalence checks.

Usage:
    python scripts/result_snapshot.py <out.json> <query1,query2,...> [sf_dir]

Writes {name: {"schema": simpleString, "rows": md5-of-sorted-rows,
"n": count}} so an optimization edit can be proven value-identical:
snapshot on the pre-edit tree (git stash), snapshot on the post-edit
tree, diff the two JSON files. Row hash covers every cell rendered
with repr (floats keep full precision), rows sorted by their full
tuple so ordering changes that queries don't promise are ignored —
for ORDER BY queries the row content itself still pins the result.

Columns whose values are run-scoped by design (per-leg wall timings
in the lifecycle cycles) are excluded from the hash by suffix.
"""

from __future__ import annotations

import hashlib
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from mbfbigdatarandomforest_spark.registry import load_all
from mbfbigdatarandomforest_spark.session import get_spark

#: value columns that legitimately differ run-to-run
VOLATILE_SUFFIXES = ("_s",)  # build_s / gate1_s / ... wall columns


def main() -> None:
    out_path = Path(sys.argv[1])
    names = [s.strip() for s in sys.argv[2].split(",") if s.strip()]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="result-snapshot")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out: dict[str, dict] = {}
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        keep = [
            f.name
            for f in df.schema.fields
            if not any(f.name.endswith(s) for s in VOLATILE_SUFFIXES)
        ]
        rows = sorted(repr(tuple(r[c] for c in keep)) for r in df.collect())
        h = hashlib.md5("\n".join(rows).encode()).hexdigest()
        out[name] = {
            "schema": df.schema.simpleString(),
            "rows": h,
            "n": len(rows),
        }
        print(f"{name}: n={len(rows)} hash={h[:12]}")
        spark.catalog.clearCache()
    out_path.write_text(json.dumps(out, indent=1, sort_keys=True) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
