"""Beyond-SF probe for the link-graph family (r11 — the round
`operators/linkgraph.py` was wired; SCALE.md rule: new corpus families
get scale evidence the round they are born).

Planted authority structure at N = 50_000 * K nodes, K in {1, 10, 40}
(40x = 2M nodes / ~2M edges), E ~= N:

- C hubs in a directed ring (the authority cores);
- 80% leaves, each linking to hub (i mod C) — hub in-degree ~N/C,
  the celebrity-skew case (one reduce key receives 100k+ edges at
  40x; the groupBy must not funnel);
- 20% sinks, each receiving one hub link and linking NOWHERE — a
  fifth of total mass goes dangling every round (the redistribution
  aggregate is load-bearing, not a corner case).

Node ids pass the affine scrambler (a*id + b mod N) so hub ids are
not clustered at the low end of the hash space.

Correctness at EVERY K is exact, not sampled: the same structure is
rebuilt in numpy (vectorized power iteration, same formulation, same
fixed 15 rounds) and per-stratum fingerprints — sum/max/count of rank
over hubs / leaves / sinks, total mass — must agree to 1e-9. At K=1
the FULL rank vector is compared (max |diff|).

Metrics per K: wall (min-of-REPS), rounds, L1-delta tail, live
checkpointed RDDs above baseline per round (must stay <=2 — the CC
discipline), and the fingerprint verdict.

r12 (r11 verdict item 5): the SAME planted structure also drives HITS
(track mode — per-round normalization + delta, the stats hook) with a
VECTORIZED numpy HITS twin checked per stratum: hubs must dominate
the hub vector (they link the ring + receive the leaves... strictly:
leaves are pure hubs, sinks pure authorities, ring hubs both) and
live_ckpt must stay <= 3 at every K (state + half + next).

Prints one JSON line:
{"base_n": ..., "reps": ..., "runs": {K: {..., "hits": {...}}}}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from mbfbigdatarandomforest_spark.operators.linkgraph import (  # noqa: E402
    hits,
    pagerank,
)
from mbfbigdatarandomforest_spark.session import get_spark  # noqa: E402

KS = tuple(
    int(k) for k in os.environ.get("SPARK_GRAFT_PROBE_KS", "1,10,40").split(",")
)
BASE_N = int(os.environ.get("SPARK_GRAFT_PR_BASE_N", "50000"))
REPS = int(os.environ.get("SPARK_GRAFT_PROBE_REPS", "2"))
N_HUBS = int(os.environ.get("SPARK_GRAFT_PR_HUBS", "16"))
ITERS = 15
PERM_A = 1_000_003
PERM_B = 7


def spark_edges(spark, n: int):
    """(src, dst) planted frame from range arithmetic — no driver lists."""
    c = N_HUBS
    leaf_hi = (8 * n) // 10
    ring = spark.range(0, c).select(
        F.col("id").alias("u"), ((F.col("id") + 1) % c).alias("v")
    )
    leaves = spark.range(c, leaf_hi).select(
        F.col("id").alias("u"), (F.col("id") % c).alias("v")
    )
    sinks = spark.range(leaf_hi, n).select(
        (F.col("id") % c).alias("u"), F.col("id").alias("v")
    )
    e = ring.union(leaves).union(sinks)
    perm = lambda col: (col * PERM_A + PERM_B) % n  # noqa: E731
    return e.select(perm(F.col("u")).alias("src"), perm(F.col("v")).alias("dst"))


def numpy_rank(n: int) -> np.ndarray:
    """Full rank vector of the UNSCRAMBLED planted graph, fixed ITERS."""
    c = N_HUBS
    leaf_hi = (8 * n) // 10
    hubs = np.arange(c)
    leaves = np.arange(c, leaf_hi)
    sinks = np.arange(leaf_hi, n)
    src = np.concatenate([hubs, leaves, sinks % c])
    dst = np.concatenate([(hubs + 1) % c, leaves % c, sinks])
    deg = np.bincount(src, minlength=n).astype(np.float64)
    d = 0.85
    r = np.full(n, 1.0 / n)
    dangling_mask = deg == 0
    share_deg = np.where(deg > 0, deg, 1.0)
    for _ in range(ITERS):
        dangling = float(r[dangling_mask].sum())
        nxt = np.full(n, (1.0 - d) / n + d * dangling / n)
        np.add.at(nxt, dst, d * r[src] / share_deg[src])
        r = nxt
    return r


HITS_ITERS = int(os.environ.get("SPARK_GRAFT_HITS_ITERS", "10"))


def numpy_hits_planted(n: int, iters: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized HITS on the UNSCRAMBLED planted graph, mirroring the
    operator's track-mode round exactly: a' = Aᵀh (current h), then
    h' = A·a' (the Gauss-Seidel order), both L2-rescaled at round end."""
    c = N_HUBS
    leaf_hi = (8 * n) // 10
    hubs = np.arange(c)
    leaves = np.arange(c, leaf_hi)
    sinks = np.arange(leaf_hi, n)
    src = np.concatenate([hubs, leaves, sinks % c])
    dst = np.concatenate([(hubs + 1) % c, leaves % c, sinks])
    h = np.ones(n)
    for _ in range(iters):
        a = np.zeros(n)
        np.add.at(a, dst, h[src])
        h = np.zeros(n)
        np.add.at(h, src, a[dst])
        h /= np.linalg.norm(h)
        a /= np.linalg.norm(a)
    return h, a


def strata_fp(n: int, node_ids: np.ndarray, ranks: np.ndarray) -> dict:
    """{stratum: (count, sum, max)} keyed on UNSCRAMBLED node ids."""
    c = N_HUBS
    leaf_hi = (8 * n) // 10
    out = {}
    for name, mask in (
        ("hubs", node_ids < c),
        ("leaves", (node_ids >= c) & (node_ids < leaf_hi)),
        ("sinks", node_ids >= leaf_hi),
    ):
        out[name] = (
            int(mask.sum()),
            round(float(ranks[mask].sum()), 12),
            round(float(ranks[mask].max()), 12),
        )
    return out


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[int, dict] = {}
    for k in KS:
        n = BASE_N * k
        probe_path = f"/tmp/pr_probe_k{k}"
        if not os.path.isdir(f"{probe_path}/edges.parquet"):
            spark_edges(spark, n).write.mode("overwrite").parquet(
                f"{probe_path}/edges.parquet"
            )
        edges = spark.read.parquet(f"{probe_path}/edges.parquet")
        edges_in = edges.count()

        walls, stats = [], {}
        result = None
        for _ in range(REPS):
            spark.catalog.clearCache()
            stats = {}
            t0 = time.time()
            result = pagerank(edges, max_iter=ITERS, tol=0.0, stats=stats)
            result.write.format("noop").mode("overwrite").save()
            walls.append(time.time() - t0)

        # exactness: unscramble ids, fingerprint per stratum vs numpy
        a_inv = pow(PERM_A % n, -1, n)
        got = result.toPandas()
        got_ids = ((got["node"].to_numpy() - PERM_B) * a_inv) % n
        got_ranks = got["rank"].to_numpy()
        want = numpy_rank(n)
        got_fp = strata_fp(n, got_ids, got_ranks)
        want_fp = strata_fp(n, np.arange(n), want)
        fp_ok = all(
            got_fp[s][0] == want_fp[s][0]
            and abs(got_fp[s][1] - want_fp[s][1]) <= 1e-9
            and abs(got_fp[s][2] - want_fp[s][2]) <= 1e-9
            for s in got_fp
        )
        row = {
            "nodes": n,
            "edges_in": edges_in,
            "wall_s": round(min(walls), 2),
            "spread": round(max(walls) / min(walls), 2),
            "rounds": stats.get("rounds"),
            "l1_delta_tail": [
                round(x, 9) for x in (stats.get("l1_deltas") or [])[-3:]
            ],
            "live_ckpt_per_round": stats.get("live_ckpt_rdds"),
            "live_ckpt_max": max(stats.get("live_ckpt_rdds") or [0]),
            "mass_ok": abs(float(got_ranks.sum()) - 1.0) <= 1e-9,
            "strata_fp_ok": fp_ok,
        }
        if k == 1:
            order = np.argsort(got_ids)
            row["max_abs_diff_full"] = float(
                np.abs(got_ranks[order] - want).max()
            )
        if not fp_ok:
            row["fp_got"], row["fp_want"] = got_fp, want_fp

        # ---- HITS on the same planted structure (r12; r13: the TIMED
        # runs are FIXED-ITERATION mode — no stats, no tol — the mode
        # every registered query runs, where the fused one-ckpt round +
        # broadcast-folded rescale lives; one extra TRACK-mode run
        # collects live_ckpt/delta evidence and its wall is reported
        # separately as hits_track_wall_s) ----
        h_walls = []
        h_result = None
        for _ in range(REPS):
            spark.catalog.clearCache()
            t0 = time.time()
            h_result = hits(edges, max_iter=HITS_ITERS, tol=0.0)
            h_result.write.format("noop").mode("overwrite").save()
            h_walls.append(time.time() - t0)
        hdf = h_result.toPandas()
        spark.catalog.clearCache()
        h_stats = {}
        t0 = time.time()
        hits(
            edges, max_iter=HITS_ITERS, tol=0.0, stats=h_stats
        ).write.format("noop").mode("overwrite").save()
        h_track_wall = time.time() - t0
        h_ids = ((hdf["node"].to_numpy() - PERM_B) * a_inv) % n
        want_h, want_a = numpy_hits_planted(n, HITS_ITERS)
        h_fp_ok = True
        for vec_name, got_vec, want_vec in (
            ("hub", hdf["hub"].to_numpy(), want_h),
            ("authority", hdf["authority"].to_numpy(), want_a),
        ):
            gf = strata_fp(n, h_ids, got_vec)
            wf = strata_fp(n, np.arange(n), want_vec)
            # RELATIVE 1e-9 on the stratum sums: an L2-normalized hub
            # vector over 400k leaves sums to ~630, where float64
            # summation-order noise alone exceeds an absolute 1e-9
            # (PageRank's sums are probability mass ≤ 1, so its
            # absolute check stays)
            ok = all(
                gf[s][0] == wf[s][0]
                and abs(gf[s][1] - wf[s][1])
                <= 1e-9 * max(1.0, abs(wf[s][1]))
                and abs(gf[s][2] - wf[s][2])
                <= 1e-9 * max(1.0, abs(wf[s][2]))
                for s in gf
            )
            if not ok:
                h_fp_ok = False
                row[f"hits_fp_{vec_name}"] = {"got": gf, "want": wf}
        # structure sanity: leaves are pure hubs (zero authority),
        # sinks pure authorities (zero hub)
        c = N_HUBS
        leaf_hi = (8 * n) // 10
        leaf_mask = (h_ids >= c) & (h_ids < leaf_hi)
        sink_mask = h_ids >= leaf_hi
        row["hits"] = {
            "iters": HITS_ITERS,
            "wall_s": round(min(h_walls), 2),
            "spread": round(max(h_walls) / min(h_walls), 2),
            "track_wall_s": round(h_track_wall, 2),
            "live_ckpt_max": max(h_stats.get("live_ckpt_rdds") or [0]),
            "strata_fp_ok": h_fp_ok,
            "leaves_pure_hubs": bool(
                (hdf["authority"].to_numpy()[leaf_mask] == 0.0).all()
            ),
            "sinks_pure_authorities": bool(
                (hdf["hub"].to_numpy()[sink_mask] == 0.0).all()
            ),
        }
        out[k] = row
        print(f"## K={k}: {row}", file=sys.stderr, flush=True)
    print(json.dumps({"base_n": BASE_N, "reps": REPS, "iters": ITERS, "runs": out}))


if __name__ == "__main__":
    main()
