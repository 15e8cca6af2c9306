"""Property-based tests (SURVEY.md §5.2.4) — hypothesis-generated
inputs against closed-form oracles. §5.2.4 singles out the fused
threshold aggregation (J5): the reference's positional alignment
(03_LinearRegression.R:133-145) is exactly where order-dependence would
corrupt results, so the engine's keyed semantics get the property
treatment.

Spark jobs are slow per-example → few, fat examples (deadline off).
"""

from __future__ import annotations

from collections import defaultdict

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from mbfbigdatarandomforest_spark.operators.rollup import threshold_rollup
from mbfbigdatarandomforest_spark.operators.cleaning import (
    collapse_rare_levels,
    null_keeping_filter,
)

ROWS = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c", "d", "e"]),
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
    ),
    min_size=1,
    max_size=200,
)


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(rows=ROWS, min_count=st.integers(min_value=0, max_value=20))
def test_threshold_rollup_matches_python_oracle(spark, rows, min_count):
    """engine output ≡ 'group once, filter count > N' computed in plain
    Python, for arbitrary grouped data and thresholds."""
    df = spark.createDataFrame(rows, "k string, v double")
    got = {
        r["k"]: (r["forecast"], r["n_obs"])
        for r in threshold_rollup(df, ["k"], "v", min_count=min_count).collect()
    }
    groups: dict[str, list[float]] = defaultdict(list)
    for k, v in rows:
        groups[k].append(v)
    want = {
        k: (sum(vs) / len(vs), len(vs))
        for k, vs in groups.items()
        if len(vs) > min_count
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][1] == want[k][1]
        assert got[k][0] == pytest.approx(want[k][0], rel=1e-9, abs=1e-9)


NULLABLE_ROWS = st.lists(
    st.one_of(
        st.none(),
        st.floats(min_value=-1e4, max_value=1e4, allow_nan=False),
    ),
    min_size=1,
    max_size=100,
)


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(vals=NULLABLE_ROWS, bound=st.floats(min_value=-1e4, max_value=1e4, allow_nan=False))
def test_null_keeping_filter_property(spark, vals, bound):
    """P5: result = {v < bound} ∪ {NULL}, exactly."""
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = {r["id"] for r in null_keeping_filter(df, F.col("v") < bound, "v").collect()}
    want = {i for i, v in rows if v is None or v < bound}
    assert got == want


@settings(
    max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    counts=st.dictionaries(
        st.sampled_from(["u", "v", "w", "x", "y"]),
        st.integers(min_value=1, max_value=60),
        min_size=1,
        max_size=5,
    ),
    threshold=st.floats(min_value=0.01, max_value=0.5),
)
def test_collapse_rare_levels_property(spark, counts, threshold):
    """F7: a level collapses iff its share is strictly below threshold;
    the surviving + collapsed totals preserve row count."""
    rows = [(lvl,) for lvl, n in counts.items() for _ in range(n)]
    total = len(rows)
    df = spark.createDataFrame(rows, "c string")
    out = [r["c"] for r in collapse_rare_levels(df, ["c"], threshold=threshold).collect()]
    assert len(out) == total
    for lvl, n in counts.items():
        share = n / total
        if share < threshold:
            assert lvl not in out
        else:
            assert out.count(lvl) == n
    n_rare = sum(n for lvl, n in counts.items() if n / total < threshold)
    assert out.count("Other") == n_rare or (
        # edge: a genuine level literally named 'Other' would merge; our
        # alphabet excludes it, so counts must match exactly
        n_rare == out.count("Other")
    )


IDX_ROWS = st.lists(
    st.integers(min_value=-1_000_000, max_value=1_000_000),
    min_size=1,
    max_size=300,
    unique=True,
)


@settings(
    max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(vals=IDX_ROWS, k=st.integers(min_value=1, max_value=12))
def test_global_row_number_and_ntile_property(spark, vals, k):
    """For ANY unique-key data and bucket count, the distributed row
    number must equal rank order, and ntile_from_rn must reproduce
    NTILE's first-buckets-get-the-remainder sizing exactly."""
    from mbfbigdatarandomforest_spark.operators.windows import (
        global_row_number,
        ntile_from_rn,
    )

    df = spark.createDataFrame([(v,) for v in vals], "v long")
    out = global_row_number(df, ["v"], idx_col="idx")
    got = {
        r["v"]: (r["idx"], r["t"])
        for r in out.withColumn(
            "t", ntile_from_rn(F.col("idx"), F.lit(len(vals)), k)
        ).collect()
    }
    n = len(vals)
    small, rem = divmod(n, k)
    want_tile = {}
    for rank, v in enumerate(sorted(vals), start=1):
        assert got[v][0] == rank
        # NTILE: first `rem` buckets hold small+1 rows
        boundary = rem * (small + 1)
        tile = (
            (rank - 1) // (small + 1) + 1
            if rank <= boundary
            else rem + (rank - boundary - 1) // small + 1
        )
        assert got[v][1] == tile, (v, rank, n, k)


@settings(
    max_examples=4, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    hot_share=st.sampled_from([0.8, 0.9]),
)
def test_global_row_number_skewed_hot_key(spark, seed, hot_share):
    """80-90% of the mass on ONE leading value: the index must still be
    the exact global rank, AND the hot value must be split across
    sub-buckets so no single window partition carries the hot mass
    (the single-task funnel the operator exists to avoid)."""
    import random

    from mbfbigdatarandomforest_spark.operators.windows import (
        _assign_buckets,
        global_row_number,
    )

    rng = random.Random(seed)
    n = 400
    hot_n = int(n * hot_share)
    hot_val = 42
    rows = [(hot_val, i) for i in range(hot_n)] + [
        (rng.choice([v for v in range(100) if v != hot_val]), hot_n + i)
        for i in range(n - hot_n)
    ]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "v long, id long")

    out = global_row_number(df, ["v", "id"], idx_col="idx", num_buckets=8)
    got = {(r["v"], r["id"]): r["idx"] for r in out.collect()}
    for rank, key in enumerate(sorted(rows), start=1):
        assert got[key] == rank, (key, rank)

    # behavior, not just correctness: the hot value's rows must span
    # multiple sub-buckets, and the largest (bkt, sub) partition must
    # hold well under the hot mass
    sizes = (
        _assign_buckets(df, ["v", "id"], 8, 0.001)
        .groupBy("__bkt", "__sub")
        .count()
        .collect()
    )
    max_part = max(r["count"] for r in sizes)
    assert max_part <= int(n * 0.35), [
        (r["__bkt"], r["__sub"], r["count"]) for r in sizes
    ]
    n_hot_parts = sum(1 for r in sizes if r["count"] > 0)
    assert n_hot_parts >= 4


TEXTS = st.lists(
    st.text(
        alphabet=st.sampled_from(list("ab c\tx 1.")),
        min_size=0,
        max_size=60,
    ),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(texts=TEXTS, n=st.integers(min_value=2, max_value=4))
def test_token_shingles_property(spark, texts, n):
    """The zipped-shifted-slice shingle formulation ≡ the obvious Python
    sliding window, for arbitrary whitespace-mangled text and n-gram
    sizes — including docs with fewer than n tokens (empty result)."""
    from mbfbigdatarandomforest_spark.operators.dedup import token_shingles

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["sh"]
        for r in df.select(
            "doc_id", token_shingles("text", n).alias("sh")
        ).collect()
    }

    def oracle(t: str) -> list[str]:
        toks = t.strip().lower().split()
        return [" ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 0))]

    for i, t in enumerate(texts):
        assert got[i] == oracle(t), (t, n, got[i], oracle(t))


ASOF_LEFT = st.lists(
    st.tuples(
        st.sampled_from(["u1", "u2"]),
        st.integers(min_value=0, max_value=50),
    ),
    min_size=1,
    max_size=20,
)
ASOF_RIGHT = st.lists(
    st.tuples(
        st.sampled_from(["u1", "u2"]),
        st.integers(min_value=0, max_value=50),
        st.one_of(st.none(), st.floats(min_value=-100, max_value=100,
                                       allow_nan=False)),
    ),
    min_size=0,
    max_size=20,
)


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(lrows=ASOF_LEFT, rrows=ASOF_RIGHT)
def test_asof_join_matches_pandas_merge_asof(spark, lrows, rrows):
    """asof_join ≡ pandas merge_asof(by=key, direction='backward') for
    arbitrary key/timestamp/NULL-payload data — including duplicate
    timestamps and NULL payload values in the latest right row (the
    round-1 advice defect class)."""
    import pandas as pd

    from mbfbigdatarandomforest_spark.operators.temporal import asof_join

    base = pd.Timestamp("2024-01-01")
    lpdf = pd.DataFrame(
        {
            "k": [k for k, _ in lrows],
            "ts": [base + pd.Timedelta(seconds=s) for _, s in lrows],
            "lval": range(len(lrows)),
        }
    )
    rpdf = pd.DataFrame(
        {
            "k": [k for k, _, _ in rrows],
            "ts": [base + pd.Timedelta(seconds=s) for _, s, _ in rrows],
            "pay": [p for _, _, p in rrows],
        }
    )
    ldf = spark.createDataFrame(lpdf)
    rdf = (
        spark.createDataFrame(rpdf)
        if len(rpdf)
        else spark.createDataFrame([], "k string, ts timestamp, pay double")
    )
    got = asof_join(ldf, rdf, ["k"]).toPandas()

    # pandas oracle: merge_asof requires sorted inputs; ties broken by
    # LAST matching right row = our "latest right at-or-before" with
    # right-before-left visibility at equal ts
    if len(rpdf):
        want = pd.merge_asof(
            lpdf.sort_values(["ts", "lval"], kind="mergesort"),
            rpdf.sort_values(["ts"], kind="mergesort"),
            on="ts",
            by="k",
            direction="backward",
        )
    else:
        want = lpdf.assign(pay=float("nan"))
    got_map = {int(r["lval"]): r["pay_asof"] for _, r in got.iterrows()}
    want_map = {int(r["lval"]): r["pay"] for _, r in want.iterrows()}
    assert set(got_map) == set(want_map)
    for lv in want_map:
        g, w = got_map[lv], want_map[lv]
        if pd.isna(w):
            assert g is None or pd.isna(g), (lv, g, w)
        else:
            assert g == pytest.approx(w), (lv, g, w)


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    texts=TEXTS,
    chunk=st.integers(min_value=2, max_value=8),
    overlap=st.integers(min_value=0, max_value=3),
)
def test_chunk_documents_property(spark, texts, chunk, overlap):
    """chunk_documents ≡ the plain Python sliding chunker: full
    coverage, correct overlap, tail remainder kept, short/empty docs
    handled."""
    from mbfbigdatarandomforest_spark.operators.text import chunk_documents

    overlap = min(overlap, chunk - 1)
    stride = chunk - overlap
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {}
    for r in chunk_documents(
        df, chunk_tokens=chunk, overlap=overlap, min_tokens=1
    ).collect():
        got[(r["id"], r["chunk_id"])] = (r["chunk_text"], r["n_tokens"], r["n_chunks"])

    for i, t in enumerate(texts):
        toks = t.strip().split()
        toks = [x for x in toks if x]
        if not toks:
            assert not any(k[0] == i for k in got)
            continue
        starts = list(range(0, max(len(toks) - chunk, 0) + stride, stride))
        starts = [s for s in starts if s < len(toks)]
        want = [" ".join(toks[s : s + chunk]) for s in starts]
        mine = [got[(i, j)][0] for j in range(len(want))]
        assert mine == want, (t, chunk, overlap, mine, want)
        # every token is covered by at least one chunk
        covered = set()
        for s in starts:
            covered |= set(range(s, min(s + chunk, len(toks))))
        assert covered == set(range(len(toks)))


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    lrows=ASOF_LEFT,
    rrows=ASOF_RIGHT,
    tol=st.integers(min_value=1, max_value=40),
)
def test_range_join_matches_brute_force(spark, lrows, rrows, tol):
    """range_join's time-bucketed plan ≡ the brute-force theta join
    |l.ts − r.ts| ≤ tol for arbitrary keys, timestamps, and tolerances —
    including rows exactly ON the tolerance and bucket boundaries."""
    import datetime

    from mbfbigdatarandomforest_spark.operators.temporal import range_join

    base = datetime.datetime(2024, 1, 1)

    def at(s):
        return base + datetime.timedelta(seconds=s)

    ldf = spark.createDataFrame(
        [(k, at(s), i) for i, (k, s) in enumerate(lrows)],
        "k string, ts timestamp, lval long",
    )
    rdf = spark.createDataFrame(
        [(k, at(s), i) for i, (k, s, _) in enumerate(rrows)],
        "k string, ts timestamp, rval long",
    )
    got = {
        (r["lval"], r["rval_r"])
        for r in range_join(ldf, rdf, ["k"], tolerance_seconds=tol).collect()
    }
    want = {
        (li, ri)
        for li, (lk, ls) in enumerate(lrows)
        for ri, (rk, rs, _) in enumerate(rrows)
        if lk == rk and abs(ls - rs) <= tol
    }
    assert got == want


LINE_DOCS = st.lists(
    st.lists(
        # small alphabet so cross-document line collisions actually occur
        st.sampled_from(["", "x", "boiler", "plate line", "alpha", "beta g", "unique"]),
        min_size=0,
        max_size=6,
    ),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(docs=LINE_DOCS, max_df=st.integers(min_value=1, max_value=3))
def test_line_dedup_property(spark, docs, max_df):
    """line_dedup ≡ the plain-Python construction (doc-frequency count
    over distinct docs, drop lines over max_doc_freq, keep short lines,
    preserve order, never lose a document row) for arbitrary corpora."""
    from mbfbigdatarandomforest_spark.operators.dedup import line_dedup

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.text, r.n_lines_kept, r.n_lines_dropped)
        for r in line_dedup(df, max_doc_freq=max_df).collect()
    }

    from collections import Counter

    freq = Counter()
    for _, text in rows:
        for ln in set(l for l in text.split("\n") if len(l) >= 1):
            freq[ln] += 1
    over = {ln for ln, c in freq.items() if c > max_df}
    want = {}
    for i, text in rows:
        lines = text.split("\n")
        kept = [l for l in lines if len(l) < 1 or l not in over]
        want[i] = ("\n".join(kept), len(kept), len(lines) - len(kept))
    assert got == want


SPAN_DOCS = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "quick", "brown", "fox"]),
        min_size=0,
        max_size=10,
    ),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    docs=SPAN_DOCS,
    n=st.integers(min_value=2, max_value=4),
    max_df=st.integers(min_value=1, max_value=2),
)
def test_span_dedup_property(spark, docs, n, max_df):
    """span_dedup ≡ the plain-Python construction (n-gram doc-frequency
    over distinct docs, drop all covered tokens, preserve order, keep
    sub-n docs whole, never lose a row) for arbitrary corpora."""
    from collections import Counter

    from mbfbigdatarandomforest_spark.operators.dedup import span_dedup

    rows = [(i, " ".join(tk)) for i, tk in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.text, r.n_tokens_kept, r.n_tokens_dropped)
        for r in span_dedup(df, n=n, max_doc_freq=max_df).collect()
    }

    freq = Counter()
    for tk in docs:
        for g in {tuple(tk[j : j + n]) for j in range(len(tk) - n + 1)}:
            freq[g] += 1
    over = {g for g, c in freq.items() if c > max_df}
    want = {}
    for i, tk in enumerate(docs):
        cov = set()
        for j in range(len(tk) - n + 1):
            if tuple(tk[j : j + n]) in over:
                cov.update(range(j, j + n))
        kept = [t for p, t in enumerate(tk) if p not in cov]
        want[i] = (" ".join(kept), len(kept), len(tk) - len(kept))
    assert got == want


PACK_DOCS = st.lists(
    st.integers(min_value=0, max_value=12),  # token count per doc
    min_size=1,
    max_size=15,
)


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(counts=PACK_DOCS, L=st.integers(min_value=1, max_value=7))
def test_pack_sequences_property(spark, counts, L):
    """pack_sequences ≡ concatenating every doc's token stream in id
    order and chunking into L-token blocks, for arbitrary corpora and
    block sizes — spans contiguous, blocks exactly full except the
    last, empty docs absent."""
    from mbfbigdatarandomforest_spark.operators.text import pack_sequences

    rows = [(i, " ".join(f"t{i}_{j}" for j in range(n))) for i, n in enumerate(counts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.block_id, r.doc_id): (r.span_start, r.span_end)
        for r in pack_sequences(df, max_tokens=L).collect()
    }

    stream = [(i, p) for i, n in enumerate(counts) for p in range(n)]
    want = {}
    for g, (i, p) in enumerate(stream):
        key = (g // L, i)
        s, e = want.get(key, (p, p))
        want[key] = (min(s, p), max(e, p + 1))
    assert got == want


C4_WORDS = [
    "the", "data", "spark", "javascript", "lorem", "ipsum", "{",
    "privacy", "policy", "use", "cookies", "a",
]
C4_LINE = st.tuples(
    st.lists(st.sampled_from(C4_WORDS), min_size=0, max_size=6).map(
        " ".join
    ),
    # ".\t" and "\t" exercise the ASCII-whitespace regex trim (a
    # trailing tab must not hide a terminal mark — review r13)
    st.sampled_from(["", ".", "!", "?", '"', " ", ". ", ".\t", "\t"]),
).map(lambda t: t[0] + t[1])
C4_DOCS = st.lists(
    st.lists(C4_LINE, min_size=0, max_size=8).map("\n".join),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(docs=C4_DOCS, min_sent=st.integers(min_value=1, max_value=4))
def test_c4_clean_property(spark, docs, min_sent):
    """c4_clean ≡ the independent Python mirror for arbitrary line
    soups that randomly hit every rule (terminal marks incl. trailing
    whitespace, word minimums, javascript, policy substrings built by
    adjacency, lorem ipsum, braces, whole-word blockwords) — every
    output column compared, not just the verdict."""
    from mbfbigdatarandomforest_spark.operators.text import c4_clean

    from test_operators import _py_c4_clean

    bw = ["data", "spark"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "i long, text string"
    )
    got = {
        r["i"]: r.asDict()
        for r in c4_clean(df, min_sentences=min_sent, blockwords=bw).collect()
    }
    for i, t in enumerate(docs):
        want = _py_c4_clean(t, min_sentences=min_sent, blockwords=bw)
        for k, v in want.items():
            assert got[i][k] == v, (i, k, repr(t), got[i][k], v)


PACK_BF_COUNTS = st.lists(
    st.integers(min_value=1, max_value=20), min_size=1, max_size=25
)


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    counts=PACK_BF_COUNTS,
    L=st.integers(min_value=4, max_value=12),
    packers=st.integers(min_value=1, max_value=3),
)
def test_pack_bestfit_property(spark, counts, L, packers):
    """pack_bestfit ≡ the naive Python BFD run per md5 packer group,
    for arbitrary corpora, capacities, and packer counts — including
    docs longer than the capacity (pre-split into full pieces +
    remainder) and single-packer global exactness."""
    import hashlib
    from collections import defaultdict

    from mbfbigdatarandomforest_spark.operators.text import pack_bestfit

    from test_operators import _py_naive_bfd

    rows = [
        (i, " ".join(f"w{i}_{j}" for j in range(n)))
        for i, n in enumerate(counts)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["span_start"]): (
            r["bin_id"], r["span_end"], r["n_tokens"]
        )
        for r in pack_bestfit(df, max_tokens=L, packers=packers).collect()
    }
    groups = defaultdict(list)
    for i, n in enumerate(counts):
        p = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % packers
        s = 0
        while s < n:
            e = min(s + L, n)
            groups[p].append((i, s, e, e - s))
            s = e
    want = {}
    for p, pieces in groups.items():
        order = sorted(pieces, key=lambda x: (-x[3], x[0], x[1]))
        for x, seq in _py_naive_bfd([(y, y[3]) for y in order], L):
            want[(x[0], x[1])] = (p * (1 << 40) + seq, x[2], x[3])
    assert got == want
