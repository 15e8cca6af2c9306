"""BPE tokenizer training/encoding (operators/bpe.py).

The incremental trainer is cross-checked against an independent naive
implementation (full pair recount every iteration, list-comprehension
merge) — same published algorithm, disjoint code — plus encode
round-trip, determinism, and a whole-pipeline pandas oracle at sf0.001.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest

from conftest import SF_DIR_SMALL
from mbfbigdatarandomforest_spark.operators import bpe
from mbfbigdatarandomforest_spark.operators.text import BPE_ISH_PATTERN


# --- independent naive oracle (recount-from-scratch, no shared helpers) ---
def _naive_merge(seq, pair, new):
    out, i = [], 0
    while i < len(seq):
        if i + 1 < len(seq) and (seq[i], seq[i + 1]) == pair:
            out.append(new)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return tuple(out)


def naive_learn_bpe(counts, num_merges):
    words = [(tuple(w) + (bpe.EOW,), c) for w, c in counts if w]
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for seq, c in words:
            for p in zip(seq, seq[1:]):
                pc[p] += c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        words = [(_naive_merge(s, best, best[0] + best[1]), c) for s, c in words]
    return merges


def naive_encode(word, merges):
    seq = tuple(word) + (bpe.EOW,)
    for m in merges:  # rank order; re-applying later merges can't help earlier ones
        prev = None
        while prev != seq:
            prev = seq
            seq = _naive_merge(seq, m, m[0] + m[1])
    return list(seq)


CORPORA = [
    [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)],  # Sennrich's example
    [("aaa", 3), ("aab", 2), ("ba", 7)],  # overlapping-pair stress
    [("の猫", 4), ("犬の", 2), ("123", 5), ("a1!", 1)],  # unicode + digits + punct
]


@pytest.mark.parametrize("corpus", CORPORA)
def test_incremental_trainer_matches_naive_recount(corpus):
    assert bpe.learn_bpe(corpus, 50) == naive_learn_bpe(corpus, 50)


def test_trainer_incremental_counts_stay_consistent_long_run():
    """Many merges over a larger synthetic vocab — the regime where a
    stale inverted-index/pair-count bug would diverge from recount."""
    corpus = [(f"w{i:03d}xyz"[: 3 + i % 5], (i % 7) + 1) for i in range(80)]
    assert bpe.learn_bpe(corpus, 300) == naive_learn_bpe(corpus, 300)


def test_encode_matches_naive_and_roundtrips():
    corpus = CORPORA[0]
    merges = bpe.learn_bpe(corpus, 30)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ("low", "lowest", "newer", "wider", "unseen", "xyzzy"):
        got = bpe.encode_word(w, ranks)
        assert got == naive_encode(w, merges), w
        assert "".join(got).replace(bpe.EOW, "") == w


def test_encode_empty_word():
    assert bpe.encode_word("", {}) == []


def test_word_counts_and_pipeline_match_pandas_oracle(spark):
    docs = spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")
    wc = {r["word"]: r["c"] for r in bpe.word_counts(docs).collect()}
    pdf = docs.toPandas()
    rx = re.compile(BPE_ISH_PATTERN)
    want = Counter()
    for t in pdf["text"]:
        want.update(rx.findall(t.lower()))
    assert wc == dict(want)

    merges = bpe.learn_bpe(sorted(wc.items()), 40)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe.bpe_token_counts(docs, merges).collect()
    }
    for _, row in pdf.iterrows():
        words = rx.findall(row["text"].lower())
        exp = sum(len(bpe.encode_word(w, ranks)) for w in words)
        assert got[row["doc_id"]] == (len(words), exp), row["doc_id"]


def test_learn_is_partitioning_invariant(spark):
    docs = spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")
    a = bpe.learn_bpe(
        [(r["word"], r["c"]) for r in bpe.word_counts(docs).collect()], 60
    )
    b = bpe.learn_bpe(
        [(r["word"], r["c"]) for r in bpe.word_counts(docs.repartition(13)).collect()],
        60,
    )
    assert a == b


def test_max_words_cap_is_deterministic(spark):
    docs = spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")
    top = [r["word"] for r in bpe.word_counts(docs, max_words=5).collect()]
    full = sorted(
        ((r["word"], r["c"]) for r in bpe.word_counts(docs).collect()),
        key=lambda wc: (-wc[1], wc[0]),
    )
    assert sorted(top) == sorted(w for w, _ in full[:5])


def test_registered_query_merge_cap_is_invisible_at_gate_sf(spark):
    """The registered query's explicit 500k merge-statistics cap (r13
    VERDICT finding 1) is a driver-safety bound, not a semantics change:
    at gate SF the distinct-word table is far below the cap, so the
    learned merges must be BIT-IDENTICAL with and without it."""
    docs = spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")
    capped = [
        (r["word"], r["c"])
        for r in bpe.word_counts(docs, max_words=500_000).collect()
    ]
    uncapped = [
        (r["word"], r["c"])
        for r in bpe.word_counts(docs, max_words=None).collect()
    ]
    assert bpe.learn_bpe(capped, num_merges=100) == bpe.learn_bpe(
        uncapped, num_merges=100
    )


def test_registered_query_runs(spark):
    from mbfbigdatarandomforest_spark.registry import load_all

    spec = load_all()["text_bpe_token_stats"]
    df = spec.fn(spark, SF_DIR_SMALL)
    rows = df.collect()
    assert df.columns == [
        "source",
        "n_docs",
        "n_words",
        "n_bpe_tokens",
        "n_chars",
    ]
    assert len(rows) > 0
    for r in rows:
        # merges only ever shorten: token count never exceeds word-char total
        assert r["n_bpe_tokens"] <= r["n_chars"] + r["n_words"]
        assert r["n_bpe_tokens"] >= r["n_words"]


# --- randomized property: incremental trainer ≡ naive recount ---------
from hypothesis import given, settings, strategies as st

_word = st.text(alphabet="abc", min_size=1, max_size=6)


@settings(max_examples=30, deadline=None)
@given(
    st.dictionaries(_word, st.integers(min_value=1, max_value=9), min_size=1, max_size=12),
    st.integers(min_value=1, max_value=25),
)
def test_trainer_property_random_corpora(counts, num_merges):
    corpus = sorted(counts.items())
    merges = bpe.learn_bpe(corpus, num_merges)
    assert merges == naive_learn_bpe(corpus, num_merges)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in counts:
        got = bpe.encode_word(w, ranks)
        assert got == naive_encode(w, merges)
        assert "".join(got).replace(bpe.EOW, "") == w


def test_precomputed_encoded_coverage_enforced(spark):
    """A precomputed encoded table missing a word must surface as NULL
    n_bpe_tokens for the affected doc — never a silent undercount."""
    docs = spark.createDataFrame(
        [(1, "aa bb"), (2, "aa aa")], "doc_id long, text string"
    )
    merges = bpe.learn_bpe([("aa", 2), ("bb", 1)], 10)
    full = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe.bpe_token_counts(docs, merges).collect()
    }
    partial_tbl = bpe.encode_vocab(
        spark.createDataFrame([("aa",)], "word string"), merges
    ).select("word", "n_tokens")
    part = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe.bpe_token_counts(docs, merges, encoded=partial_tbl).collect()
    }
    assert part[1] is None  # 'bb' uncovered → visible NULL
    assert part[2] == full[2]  # fully covered doc unaffected


def test_merges_save_load_roundtrip(tmp_path):
    merges = bpe.learn_bpe(CORPORA[0], 30)
    p = tmp_path / "tok" / "merges.json"
    bpe.save_merges(merges, str(p))
    assert bpe.load_merges(str(p)) == merges
