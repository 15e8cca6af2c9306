"""Capture .explain('formatted') for registered queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> [query1,query2,...]

Writes plans/<tag>/<query>_<suffix>.txt where suffix comes from
$PLAN_SUFFIX (default "before"). Queries whose construction runs side
effects (the lifecycle cycles) still capture the returned frame's plan
— that is the plan the bench's noop sink executes.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from mbfbigdatarandomforest_spark.registry import load_all
from mbfbigdatarandomforest_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r16"
    only = None
    if len(sys.argv) > 2:
        only = {s.strip() for s in sys.argv[2].split(",") if s.strip()}
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = Path(__file__).resolve().parents[1] / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    for name, spec in specs.items():
        if only is not None and name not in only:
            continue
        try:
            df = spec.fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
            print(f"captured {name}")
        except Exception as exc:  # noqa: BLE001 — capture the rest
            print(f"FAILED {name}: {exc}", file=sys.stderr)
        finally:
            spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
