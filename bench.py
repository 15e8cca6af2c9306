"""Benchmark harness: runs EVERY registered query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. Stdout carries the full JSON record first
and ENDS with a compact (<1900-byte) JSON summary line — the line the
round harness parses; the full record also lands in BENCH_FULL.json.

Round 6 widened coverage from the 22-query headline set to the full
registry (74 queries, named exclusion list: EMPTY) — an unbenched query
can silently regress 10× between rounds (this round's sweep caught
dedup_simhash_pairs at 41 s). The former headline subset's subtotal is
still reported (``headline_total``) for cross-round comparability.

Headline-set change (round 7): ``q1_pricing_summary`` absorbed the former
``q6_discount_revenue`` scan as its method-tagged 'Q6' section, so
``headline_total`` from r7 onward includes that scan inside q1's figure
and is NOT like-for-like with r6-and-earlier headlines (shift ≈ +1 s;
the fused q1 is itself cheaper than the former q1+q6 pair).

Each query is fully materialized via the noop sink (forces every column
and operator to execute — ``count()`` alone would let Catalyst prune
expensive expressions).

Noise control: each query runs $SPARK_GRAFT_BENCH_REPS times (default 3)
and the reported figure is the MIN — the standard noise floor on a host
with documented CPU-steal up to ±2.5x (SCALE.md §6). The cache is cleared
between every rep, so every rep is a cold standalone run of the plan
(no cached-intermediate leaks); what later reps amortize is JVM JIT and
host-level page cache, which is exactly the noise min-of-N exists to
strip. The JSON line carries a "reps" field.

Output protocol (round-7 fix): the round harness records only the LAST
2000 BYTES of this script's stdout and parses the JSON line out of that
tail. Round 6's single ~4.5 KB line (73 queries + rep_spread) was
truncated mid-JSON and the official record came back ``"parsed": null``.
So now: the FULL record (every query, every spread) goes to the sidecar
file ``BENCH_FULL.json`` next to this script and is also printed FIRST
on stdout (greppable in any wider log capture), and stdout ENDS with a
compact summary line built by :func:`compact_record` that is guaranteed
< 1900 bytes (pinned by ``tests/test_bench_compact.py``): totals, reps,
error count, and the 10 slowest queries with their spreads.

Best-sweep banking (round 13, verdict item 9): r12's OFFICIAL record
landed in a ×1.3 steal window while a clean 117 s sweep existed
mid-round. Every completed, error-free, un-narrowed sweep now banks its
compact line plus its sentinel steal ratio into ``BENCH_BEST.json``
(scoped by round / SF / benched-query-set fingerprint); when a later
sweep's bracketing sentinels read worse than ``STEAL_GATE`` × nominal
and a cleaner banked sweep exists, the banked line is printed as the
driver-parsed FINAL line (tagged ``from_best_sweep`` +
``this_sweep_calib_s``) with the noisy sweep's own compact line printed
just above it and its full record still in ``BENCH_FULL.json``.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from mbfbigdatarandomforest_spark.registry import load_all
from mbfbigdatarandomforest_spark.session import get_spark

HEADLINE = [
    # r12: q3_top_revenue_orders removed — deregistered (fused into
    # tpch_ansi_suite2 's3', which the tail group still times every
    # sweep). Headline totals before r12 included its ~0.4 s.
    "q1_pricing_summary",
    "q5_nation_revenue",
    "nation_status_ratio",
    "customer_order_rollup",
    "events_hourly_rollup",
    "dedup_exact",
    "dedup_minhash_pairs",      # banded b×r LSH production path, exact-verified
    "dedup_embedding_ann",      # IVF candidates + exact cosine verify
    "similarity_cosine_topk",
    "text_enrich_per_doc",      # quality+lang-id+fingerprint, one scan
    "decontaminate_ngram",      # benchmark n-gram scrub (broadcast gram set)
    "sample_mixture_suite",     # corpus mixing, 3 deterministic modes (r4)
    "text_lm_perplexity",       # CCNet bigram-LM train+score+bucket (r5)
    "text_bpe_token_stats",     # real BPE train + vocab-side encode (r5)
    "sample_importance_dsir",   # DSIR hashed-ngram importance resampling (r5)
    "tpch_correlated_suite",    # q2/q4/q17/q22 shapes, Catalyst-decorrelated (r5)
    "text_quality_classifier",  # GPT-3-style HashingTF+LR filter (r5)
    "text_pack_materialize",    # packed-block shard writer (r5)
    "corpus_datasheet",         # per-source corpus report (r5)
    "ml_ols_metrics",           # closed r5: 1.9s, matching the GPU baseline
    "ml_random_forest_metrics",
]

#: Registered queries deliberately NOT benched (none today). If a query
#: ever must be excluded (e.g. an env-gated path), name it here with a
#: reason — silent omission is how a 10× regression hides for a round.
EXCLUDED: dict[str, str] = {}

#: The noise-bound tree-ML lane (r14 — r13 VERDICT finding 5: these
#: carried within-sweep rep spreads ≥1.4 for three straight rounds,
#: making round-over-round deltas unreadable at min-of-3). They run
#: min-of-max(reps,5) and log every rep wall into BENCH_FULL.
ML_NOISE_LANE = frozenset(
    ("ml_random_forest_metrics", "ml_gbt_metrics", "ml_dart_metrics")
)

#: The persisted-index lifecycle queries (r16 — r15 VERDICT finding 2:
#: each cycle is ~30 small Spark actions — job-count-bound at test
#: scale, so ~35 s/sweep of min-of-3 was pure scheduling latency, not
#: data). They run ONE rep per sweep; their evidence is the sentinel
#: columns they emit, and their per-leg walls ride the output row
#: (build_s/gate1_s/append_s/gate2_s[/rebuild_s/gate3_s]) so leg-level
#: drift stays visible without extra reps.
LIFECYCLE_LANE = frozenset(
    ("dedup_index_cycle", "dedup_semantic_index_cycle")
)

#: Hard ceiling for the driver-facing final stdout line. The harness
#: keeps the last 2000 bytes of stdout; 1900 leaves margin for the
#: trailing newline and any stray stderr interleaving.
COMPACT_BYTE_BUDGET = 1900

#: Rows of fixed CPU-bound work for the calibration sentinel (~0.85 s
#: nominal on this host warm — long enough to be CPU-dominated, short
#: enough that reps cost ~3 s per bench run).
CALIB_ROWS = 48_000_000

#: The sentinel's nominal wall on an unloaded host — the MINIMUM ever
#: observed (0.699 s in the r9 A/B runs; the first estimate of 0.85
#: was itself taken under load, which is exactly the failure mode the
#: sentinel exists to expose). Not used in any computation — recorded
#: so a future reader can normalize: effective_steal ≈ calib_s / this.
#: Ratchet DOWN if a future run reads lower; never up.
CALIB_NOMINAL_S = 0.70


def run_calibration(spark, reps: int) -> tuple[float, float]:
    """Fixed-work steal detector (r9, verdict item: BENCH_r08 recorded
    a 1.35× host-steal-inflated wall and only a forensic diff against a
    same-code builder run proved it). This times a CONSTANT CPU-bound
    query on literal data — no files, no SF dependence, no shuffle —
    identically to the real queries (min over ``reps``, noop sink). Any
    round's record can then be normalized to known-work units:
    a high ``calib_s`` (vs ``CALIB_NOMINAL_S``) with uniform per-query
    inflation is host steal, not a code regression.

    Returns (min_seconds, spread) like a regular query row."""
    from pyspark.sql import functions as F

    best, worst = None, None
    for _ in range(max(1, reps)):
        t0 = time.perf_counter()
        spark.range(0, CALIB_ROWS, 1, 32).select(
            F.sum(
                F.crc32(F.sha2(F.col("id").cast("string"), 256))
            ).alias("x")
        ).write.mode("overwrite").format("noop").save()
        elapsed = time.perf_counter() - t0
        best = elapsed if best is None else min(best, elapsed)
        worst = elapsed if worst is None else max(worst, elapsed)
    return round(best, 3), round(worst / best, 2) if best else 1.0


def compact_record(out: dict) -> str:
    """Build the driver-facing final JSON line, guaranteed < 1900 bytes.

    Keeps the schema the driver already parses (metric/value/unit/
    queries/sf) but restricts ``queries`` to the N slowest successful
    timings (plus their rep spreads) and shrinks N further if the
    serialized line would still exceed the budget — by construction it
    can never regrow past ``COMPACT_BYTE_BUDGET``.
    """
    timings = out["queries"]
    ok = {n: t for n, t in timings.items() if isinstance(t, (int, float))}
    slowest = sorted(ok, key=ok.get, reverse=True)
    for n_slow in range(10, -1, -1):
        top = slowest[:n_slow]
        compact = {
            "metric": out["metric"],
            "value": out["value"],
            "unit": out["unit"],
            "sf": out["sf"],
            "reps": out["reps"],
            "n_queries": out["n_queries"],
            "headline_total": out["headline_total"],
            "errors": out.get("errors", 0),
            # r17 (r16 VERDICT items 1/2): the core count and code
            # version ride the driver-parsed line so a scoping bug like
            # r16's (an 8-core sweep's final line silently replaced by
            # a 32-core banked record) is self-evident in the record.
            "cpus": out.get("cpus"),
            "head": out.get("head"),
            "calib_pre_s": out.get("calib_pre_s"),
            "calib_s": out.get("calib_s"),
            "calib_spread": out.get("calib_spread"),
            "spread_med": out.get("spread_med"),
            "queries": {n: ok[n] for n in top},
            "rep_spread": {n: out["rep_spread"].get(n) for n in top},
            "full": "BENCH_FULL.json",
        }
        line = json.dumps(compact)
        if len(line.encode()) < COMPACT_BYTE_BUDGET:
            return line
    # Unreachable (n_slow=0 is ~300 bytes), but never raise from here.
    return json.dumps({"metric": out["metric"], "value": out["value"]})


#: Sentinel gate for the best-sweep sidecar (r13, verdict item 9): a
#: sweep whose bracketing sentinels read worse than this multiple of
#: CALIB_NOMINAL_S is a steal window — if a cleaner same-round,
#: same-SF, same-query-set sweep was completed earlier, ITS compact
#: line is printed as the driver-parsed final line instead (the noisy
#: sweep's full record still prints and lands in BENCH_FULL.json).
STEAL_GATE = 1.15


def _round_id() -> int | None:
    """Current round from the driver's PROGRESS.jsonl (last line), or
    None outside a driver round. Scopes the best-sweep sidecar: a
    cleaner sweep from a PREVIOUS round must never mask this round's
    real perf change."""
    try:
        lines = (
            (Path(__file__).resolve().parent / "PROGRESS.jsonl")
            .read_text()
            .strip()
            .splitlines()
        )
        return json.loads(lines[-1]).get("round")
    except Exception:  # noqa: BLE001 — best-effort scoping only
        return None


def _query_set_key(names: list[str]) -> str:
    """Fingerprint of the benched query set — a best record taken
    before a gate swap must not stand in for the new registry."""
    return hashlib.md5(",".join(sorted(names)).encode()).hexdigest()[:12]


def _git_head() -> str | None:
    """Short HEAD of the repo, or None outside git — provenance only
    (rides the record and the compact line). The bank's comparable
    check uses :func:`_code_fingerprint` instead: measurement-artifact
    commits (BENCH_*.json, logs) move HEAD without changing any code,
    and keying on HEAD would wrongly invalidate a clean banked sweep
    for the driver's run right after the round's artifact commits."""
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=Path(__file__).resolve().parent,
            capture_output=True,
            text=True,
            timeout=10,
            check=True,
        ).stdout.strip() or None
    except Exception:  # noqa: BLE001 — best-effort scoping only
        return None


def _code_fingerprint() -> str | None:
    """md5 over the code that determines query performance (this file,
    the driver entry, and every engine module). Scopes the best-sweep
    sidecar (r17, r16 VERDICT item 1): a record banked on DIFFERENT
    CODE must never substitute for the current sweep — r16's banked
    'after' predated the round's last three optimization commits."""
    try:
        root = Path(__file__).resolve().parent
        files = [root / "bench.py", root / "__spark_entry__.py"]
        files += sorted((root / "mbfbigdatarandomforest_spark").rglob("*.py"))
        h = hashlib.md5()
        for f in files:
            h.update(str(f.relative_to(root)).encode())
            h.update(f.read_bytes())
        return h.hexdigest()[:12]
    except Exception:  # noqa: BLE001 — best-effort scoping only
        return None


def resolve_final_line(
    out: dict,
    current_line: str,
    names: list[str],
    narrowed: bool,
    best_path: Path,
    round_id: int | None,
) -> str:
    """The driver-parsed final stdout line (r13, verdict item 9): the
    current sweep's compact line, UNLESS its bracketing sentinels read
    worse than STEAL_GATE × nominal and a cleaner completed sweep of
    the SAME round / SF / query set exists in the sidecar — then the
    clean sweep's line is emitted (tagged ``from_best_sweep`` with this
    sweep's sentinel so the provenance is in the record). A completed,
    un-narrowed, error-free sweep that is at least as clean as the
    stored best replaces it. All sidecar I/O is best-effort — a
    corrupt or unwritable sidecar never costs the bench record."""
    cals = [
        c
        for c in (out.get("calib_pre_s"), out.get("calib_s"))
        if isinstance(c, (int, float))
    ]
    steal = round(max(cals) / CALIB_NOMINAL_S, 3) if cals else None
    qkey = _query_set_key(names)
    try:
        bank = json.loads(best_path.read_text())
    except Exception:  # noqa: BLE001
        bank = None
    # Bank format (r17): one record PER core count — {"32": rec,
    # "8": rec}. Without this, the driver's lower-core scaling sweep
    # would CLOBBER the round's clean 32-core bank (or vice versa,
    # depending on run order), since the two sweeps are never
    # comparable to each other. Legacy single-record files (≤ r16)
    # are read as the record for their own cpus.
    if isinstance(bank, dict) and "compact" in bank:
        bank = {str(bank.get("cpus")): bank}
    if not isinstance(bank, dict):
        bank = {}
    best = bank.get(str(out.get("cpus")))
    comparable = (
        isinstance(best, dict)
        and best.get("sf") == out["sf"]
        and best.get("qkey") == qkey
        and best.get("round") == round_id
        # r17 (r16 VERDICT item 1): a banked record from a DIFFERENT
        # core count or different code must never substitute for this
        # sweep — r16's 8-core scaling sweep was silently replaced by
        # the 32-core banked line (every driver scaling ratio read
        # exactly 1.0), and the banked "after" predated the round's
        # last three optimization commits. Code identity is the content
        # fingerprint, not git HEAD: artifact-only commits must not
        # invalidate a clean banked sweep.
        and best.get("cpus") == out.get("cpus")
        and best.get("code_fp") == out.get("code_fp")
        and isinstance(best.get("steal"), (int, float))
    )
    eligible = (
        not narrowed and not out.get("errors") and steal is not None
    )
    if eligible and (not comparable or steal <= best["steal"]):
        record = {
            "sf": out["sf"],
            "round": round_id,
            "qkey": qkey,
            "cpus": out.get("cpus"),
            "head": out.get("head"),
            "code_fp": out.get("code_fp"),
            "steal": steal,
            "compact": json.loads(current_line),
        }
        bank[str(out.get("cpus"))] = record
        try:
            best_path.write_text(json.dumps(bank) + "\n")
        except OSError as exc:
            print(
                f"bench: best-sidecar write failed (continuing): {exc}",
                file=sys.stderr,
            )
        return current_line  # current IS the round's cleanest sweep
    if (
        comparable
        and steal is not None
        and steal > STEAL_GATE
        and best["steal"] < steal
    ):
        emitted = dict(best["compact"])
        emitted["from_best_sweep"] = True
        emitted["this_sweep_calib_s"] = out.get("calib_s")
        line = json.dumps(emitted)
        if len(line.encode()) >= COMPACT_BYTE_BUDGET:
            line = json.dumps(best["compact"])  # drop tags, keep budget
        return line
    return current_line


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(app_name="mbf-rf-bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    # Untimed warmup: pay one-time session costs outside the per-query
    # timings — parquet footer reads for every input table, whole-stage
    # codegen for the decimal-sum aggregate shape, and the Python
    # worker daemon pool (first pandas UDF pays the fork+import).
    # Best-effort: a warmup failure only costs timing accuracy, never
    # the bench record itself.
    try:
        from pyspark.sql import functions as F

        for t in ("nation", "lineitem", "orders", "documents", "embeddings"):
            spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").groupBy("l_returnflag").agg(
            F.sum(F.col("l_extendedprice").cast("decimal(38,12)")),
            F.avg("l_quantity"),
        ).collect()
        spark.range(32).repartition(32).mapInPandas(
            lambda it: it, schema="id long"
        ).count()
        # MLlib class-loading + codegen for the REAL pipeline shapes —
        # one-time JVM costs, not per-query work. A generic 64-row toy
        # fit misses the tree-learner/indexer/Gramian code paths the
        # headline ML queries compile (measured: ~12 s of pure JIT
        # still landed on the first timed RF run); running the actual
        # train/eval machinery on a 2000-row slice pays it here.
        from mbfbigdatarandomforest_spark.ml.ols_gram import (
            ols_sufficient_stats_metrics,
        )
        from mbfbigdatarandomforest_spark.ml.regressors import train_and_evaluate
        from mbfbigdatarandomforest_spark.plans.ml_queries import _lineitem_features

        tiny = _lineitem_features(spark, sf_dir).limit(2000)
        ml_kw = dict(
            label_col="label",
            categorical=["p_brand", "p_type"],
            numeric=["l_quantity", "l_discount", "l_tax", "p_retailprice"],
        )
        train_and_evaluate(tiny, kind="random_forest", numTrees=2, maxDepth=2, **ml_kw)
        ols_sufficient_stats_metrics(tiny, **ml_kw)
        spark.catalog.clearCache()
    except Exception as exc:  # noqa: BLE001
        print(f"bench: warmup failed (continuing): {exc}", file=sys.stderr)
    # Pre-sweep calibration: steal varies over the ~5-minute sweep
    # window (r9's first record: post-sweep calib read nominal while
    # untouched queries ran uniformly ~1.2× the r8 builder record), so
    # ONE sentinel can miss a transient. The pre/post pair brackets
    # the window; read max(calib_pre_s, calib_s) as the floor steal.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    try:
        calib_pre, _ = run_calibration(spark, reps)
    except Exception as exc:  # noqa: BLE001
        print(f"bench: pre-calibration failed (continuing): {exc}", file=sys.stderr)
        calib_pre = None
    # Per-query fault isolation: one broken query must never erase the
    # round's whole performance record (round-3 lesson — a single loader
    # regression left BENCH_r03.json with rc=1 and no timings at all).
    # Failures are reported as {"error": ...}; total sums the successes.
    # Bench order: headline first (cross-round comparability — those
    # timings keep their historical position right after warmup), then
    # every remaining registered query in registry order. An optional
    # comma-separated SPARK_GRAFT_BENCH_ONLY narrows the set for local
    # iteration; the driver's per-round record always runs everything.
    names = [n for n in HEADLINE if n not in EXCLUDED]
    names += [n for n in specs if n not in HEADLINE and n not in EXCLUDED]
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        keep = {s.strip() for s in only.split(",") if s.strip()}
        names = [n for n in names if n in keep]
    timings: dict[str, object] = {}
    spreads: dict[str, float] = {}
    rep_walls: dict[str, list[float]] = {}
    errors = 0
    for name in names:
        best, worst, err = None, None, None
        # r14 (r13 VERDICT finding 5): the tree-ML lane has carried
        # ≥1.4 within-sweep spreads for three rounds — min-of-3 is
        # noise-bound there, so those queries run extra reps and log
        # every rep wall (BENCH_FULL only; the compact line is pinned)
        # so steal can be separated from variance after the fact.
        n_reps = max(reps, 5) if name in ML_NOISE_LANE else reps
        if name in LIFECYCLE_LANE:
            n_reps = 1
        if name in ML_NOISE_LANE:
            # r15 (r14 VERDICT finding 3): the lane's first rep is dead
            # weight — ml_rep_walls shows one JIT/daemon outlier then a
            # stable floor (RF r14: [10.34, 5.66, 4.87, 5.06, 4.93]) —
            # so pay it ONCE untimed: rep_spread then reports the
            # floor's true scatter instead of the warmup artifact.
            # Best-effort like the global warmup: a failure here only
            # costs timing accuracy — the timed loop records real errs.
            try:
                specs[name].fn(spark, sf_dir).write.mode(
                    "overwrite"
                ).format("noop").save()
            except Exception:  # noqa: BLE001
                pass
            finally:
                spark.catalog.clearCache()
        for _ in range(n_reps):
            try:
                fn = specs[name].fn
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
                elapsed = time.perf_counter() - t0
                best = elapsed if best is None else min(best, elapsed)
                worst = elapsed if worst is None else max(worst, elapsed)
                if name in ML_NOISE_LANE:
                    rep_walls.setdefault(name, []).append(round(elapsed, 3))
            except Exception as exc:  # noqa: BLE001 — survive anything, keep timing the rest
                err = f"{type(exc).__name__}: {exc}".splitlines()[0][:300]
                print(f"bench: {name} FAILED: {err}", file=sys.stderr)
                break
            finally:
                # queries that cache intermediates (LSH shingle frames,
                # ANN centroids) would otherwise leak storage memory into
                # every LATER timing — every rep times a cold, standalone
                # run of the plan
                spark.catalog.clearCache()
        if best is not None:
            # min over the successful reps (a failure after a success
            # still yields a timing; the stderr line records the flake)
            timings[name] = round(best, 3)
            # max/min over the reps — the host-noise diagnostic. A
            # cross-round delta on a query whose spread is ~2 is steal,
            # not regression (text_lm_stupid_backoff measured 3.5 s and
            # 7.6 s in two same-code r6 sweeps); spread ~1 deltas are
            # real. Lets the next round triage without re-running.
            spreads[name] = round(worst / best, 2) if best > 0 else 1.0
        else:
            errors += 1
            timings[name] = {"error": err}
    # Calibration sentinel AFTER the sweep: it shares the same host
    # window as the timings it normalizes (steal at minute 0 vs minute
    # 20 can differ; the sweep's tail is where the slow ML queries sit).
    try:
        calib_s, calib_spread = run_calibration(spark, reps)
    except Exception as exc:  # noqa: BLE001 — never cost the record
        print(f"bench: calibration failed (continuing): {exc}", file=sys.stderr)
        calib_s, calib_spread = None, None
    total = round(sum(t for t in timings.values() if isinstance(t, (int, float))), 3)
    headline_total = round(
        sum(
            t
            for n, t in timings.items()
            if n in HEADLINE and isinstance(t, (int, float))
        ),
        3,
    )
    try:
        cpus: int | str | None = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    except ValueError:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
    out = {
        "metric": "registry_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "reps": reps,
        "cpus": cpus,
        "head": _git_head(),
        "code_fp": _code_fingerprint(),
        "n_queries": len(names),
        "headline_total": headline_total,
        "excluded": EXCLUDED,
        "rep_spread": spreads,
        "calib_pre_s": calib_pre,
        "calib_s": calib_s,
        "calib_spread": calib_spread,
        "calib_nominal_s": CALIB_NOMINAL_S,
        # per-rep walls for the noise-bound ML lane (min-of-5 there):
        # lets a later round separate steal (one outlier rep) from
        # variance (uniform scatter) without re-running
        "ml_rep_walls": rep_walls,
        # Median rep spread across successful queries — the one-number
        # host-noise summary (≈1 quiet, ≥1.3 noisy window).
        "spread_med": (
            round(sorted(spreads.values())[len(spreads) // 2], 2)
            if spreads
            else None
        ),
    }
    if errors:
        out["errors"] = errors
    # Full record: sidecar file (the durable per-round artifact) + an
    # early stdout print (survives in any log capture wider than the
    # driver's 2000-byte tail). Sidecar write is best-effort — a
    # read-only CWD must not cost the round its bench record.
    full_line = json.dumps(out)
    try:
        (Path(__file__).resolve().parent / "BENCH_FULL.json").write_text(
            full_line + "\n"
        )
    except OSError as exc:
        print(f"bench: sidecar write failed (continuing): {exc}", file=sys.stderr)
    print(full_line)
    # The driver parses the LAST line of its 2000-byte stdout tail —
    # compact by construction; a steal-window sweep defers to the
    # round's cleanest completed sweep (BENCH_BEST.json, item 9 r13).
    current_line = compact_record(out)
    if current_line != (final_line := resolve_final_line(
        out,
        current_line,
        names,
        narrowed=bool(only),
        best_path=Path(__file__).resolve().parent / "BENCH_BEST.json",
        round_id=_round_id(),
    )):
        print(current_line)  # the noisy sweep stays visible above
    print(final_line)
    try:
        spark.stop()
    except Exception:
        pass


if __name__ == "__main__":
    main()
