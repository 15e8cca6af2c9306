"""Deterministic realistic-corpus generator for published-parameter
validation of the curation operator family.

The driver's synthetic ``documents`` table is word-soup from a tiny
vocabulary (~31 types, ~50 tokens/doc), which forces every text
operator's registered query to run tuned-down knobs (5-gram decontam
instead of the published 13-gram convention, relaxed Gopher thresholds,
order-2/3 LMs). This generator produces a corpus the PUBLISHED recipes
behave on:

- **Zipf vocabulary** (default 5 000 types, exponent 1.05 — the
  classic fit for natural language rank-frequency) of alphabetic words
   3–9 chars, plus the Gopher stopword list interleaved every ~5 tokens
  so function-word rules fire the way they do on prose.
- **Long documents** (default 300–800 content tokens) with sentence
  punctuation every ~12 tokens and a newline every ~60 — so
  line-shaped rules (bullet/ellipsis fractions) see real lines.
- **Injected defect classes**, each exercising one published rule at
  its DEFAULT threshold (labels in the ``kind`` column):
  ``short`` (<50 words), ``symbols`` (hash-spam), ``bullets``
  (bullet-point lines), ``numeric`` (alpha fraction below 0.8),
  ``nostop`` (stopwords stripped), ``gibberish`` (uniform draws from a
  DISJOINT vocabulary — the LM-tail class), ``contaminated`` (a
  verbatim ≥13-token span copied from a benchmark doc), ``exact_dup``
  and ``near_dup`` (verbatim / ~2 %-token-edited copies of natural
  docs).

Everything is a pure function of ``seed`` (numpy ``default_rng``) —
tests and the SCALE probe generate byte-identical corpora.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..operators.text import GOPHER_STOPWORDS

_LETTERS = np.array(list("abcdefghijklmnopqrstuvwxyz"))


def _make_vocab(
    rng: np.random.Generator,
    n_types: int,
    *,
    prefix: str = "",
    exclude: set[str] | None = None,
) -> list[str]:
    """``n_types`` distinct alphabetic words, lengths 3-9; ``prefix``
    plus ``exclude`` (pass the natural vocabulary) carve out a vocabulary
    genuinely disjoint from it (gibberish class)."""
    seen: set[str] = set(GOPHER_STOPWORDS) | (exclude or set())
    out: list[str] = []
    while len(out) < n_types:
        length = int(rng.integers(3, 10))
        w = prefix + "".join(rng.choice(_LETTERS, size=length))
        if w not in seen:
            seen.add(w)
            out.append(w)
    return out


def _zipf_probs(n: int, a: float = 1.05) -> np.ndarray:
    p = 1.0 / np.arange(1, n + 1) ** a
    return p / p.sum()


@dataclass
class CorpusSpec:
    seed: int = 7
    n_docs: int = 2_000
    vocab_size: int = 5_000
    min_tokens: int = 300
    max_tokens: int = 800
    #: per-defect-class share of n_docs (the rest are ``natural``)
    shares: dict = field(
        default_factory=lambda: {
            "short": 0.02,
            "symbols": 0.02,
            "bullets": 0.02,
            "numeric": 0.02,
            "nostop": 0.02,
            "gibberish": 0.05,
            "contaminated": 0.03,
            "exact_dup": 0.03,
            "near_dup": 0.03,
            "pii": 0.03,
        }
    )
    n_benchmark: int = 50


def _natural_tokens(
    rng: np.random.Generator, vocab: list[str], p: np.ndarray, n: int,
    stopwords: bool = True,
) -> list[str]:
    content = rng.choice(len(vocab), size=n, p=p)
    toks: list[str] = []
    for i, wi in enumerate(content):
        toks.append(vocab[int(wi)])
        if stopwords and i % 5 == 2:
            toks.append(GOPHER_STOPWORDS[int(rng.integers(len(GOPHER_STOPWORDS)))])
    return toks


def _render(toks: list[str]) -> str:
    """Sentence punctuation every ~12 tokens, newline every ~60."""
    out = list(toks)
    for i in range(12, len(out), 12):
        out[i - 1] = out[i - 1] + "."
    lines = [" ".join(out[i : i + 60]) for i in range(0, len(out), 60)]
    return "\n".join(lines)


def generate(spec: CorpusSpec | None = None) -> tuple[list[dict], list[dict]]:
    """Returns ``(corpus_rows, benchmark_rows)`` — dicts with keys
    (doc_id, kind, lang, text). ``benchmark_rows`` are the held-out eval
    docs decontamination scrubs against (kind='benchmark')."""
    spec = spec or CorpusSpec()
    rng = np.random.default_rng(spec.seed)
    vocab = _make_vocab(rng, spec.vocab_size)
    gib_vocab = _make_vocab(rng, spec.vocab_size, prefix="zq", exclude=set(vocab))
    p = _zipf_probs(spec.vocab_size)

    def doc_len() -> int:
        return int(rng.integers(spec.min_tokens, spec.max_tokens + 1))

    benchmark = [
        {
            "doc_id": f"bench{i:04d}",
            "kind": "benchmark",
            "lang": "en",
            "text": _render(_natural_tokens(rng, vocab, p, doc_len())),
        }
        for i in range(spec.n_benchmark)
    ]

    counts = {k: int(round(v * spec.n_docs)) for k, v in spec.shares.items()}
    n_special = sum(counts.values())
    n_natural = spec.n_docs - n_special
    rows: list[dict] = []
    naturals: list[str] = []
    for i in range(n_natural):
        text = _render(_natural_tokens(rng, vocab, p, doc_len()))
        naturals.append(text)
        rows.append(
            {"doc_id": f"doc{i:05d}", "kind": "natural", "lang": "en", "text": text}
        )
    nxt = n_natural

    def add(kind: str, text: str, dup_of: str | None = None) -> None:
        nonlocal nxt
        rows.append(
            {
                "doc_id": f"doc{nxt:05d}",
                "kind": kind,
                "lang": "en",
                "text": text,
                "dup_of": dup_of,
            }
        )
        nxt += 1

    for _ in range(counts["short"]):
        add("short", _render(_natural_tokens(rng, vocab, p, 20)))
    for _ in range(counts["symbols"]):
        toks = _natural_tokens(rng, vocab, p, doc_len())
        # one '#' per ~5 words => ratio ~0.2 > the 0.1 default
        spammed = [t + " ##" if i % 5 == 0 else t for i, t in enumerate(toks)]
        add("symbols", _render(spammed))
    for _ in range(counts["bullets"]):
        toks = _natural_tokens(rng, vocab, p, doc_len())
        lines = [
            "- " + " ".join(toks[i : i + 8]) for i in range(0, len(toks), 8)
        ]  # every line a bullet => frac 1.0 > 0.9 default
        add("bullets", "\n".join(lines))
    for _ in range(counts["numeric"]):
        toks = _natural_tokens(rng, vocab, p, doc_len())
        # 30% of words numeric => alpha frac ~0.7 < 0.8 default
        nummed = [
            str(int(rng.integers(10_000, 99_999))) if i % 3 == 0 else t
            for i, t in enumerate(toks)
        ]
        add("numeric", _render(nummed))
    for _ in range(counts["nostop"]):
        add(
            "nostop",
            _render(_natural_tokens(rng, vocab, p, doc_len(), stopwords=False)),
        )
    # gibberish: uniform draws from the disjoint vocabulary, through the
    # SAME interleave helper as natural docs (the stopword cadence
    # calibrates the Gopher stopword rule — one definition): it passes
    # Gopher and reaches the LM stage, whose job dropping it is
    gib_p = np.full(len(gib_vocab), 1.0 / len(gib_vocab))
    for _ in range(counts["gibberish"]):
        add("gibberish", _render(_natural_tokens(rng, gib_vocab, gib_p, doc_len())))
    for _ in range(counts["contaminated"]):
        # splice a verbatim 30-whitespace-token benchmark span into an
        # ALREADY-rendered natural doc — re-rendering would append '.'
        # to every 12th token and could corrupt the span below 13
        # consecutive identical tokens
        base = _render(_natural_tokens(rng, vocab, p, doc_len())).split()
        bench_toks = benchmark[int(rng.integers(len(benchmark)))]["text"].split()
        start = int(rng.integers(0, max(1, len(bench_toks) - 30)))
        span = bench_toks[start : start + 30]
        pos = int(rng.integers(0, len(base)))
        add("contaminated", " ".join(base[:pos] + span + base[pos:]))
    # pii: natural prose with KNOWN counts of each identifier kind
    # injected at random token positions — the ground truth for the
    # scrub's recovery precision/recall (r8 verdict item 5). The
    # formats cover every alternation of operators/pii.PII_PATTERNS;
    # counts ride the row as want_n_<kind> (named so they can never
    # collide with scrub_pii's own n_<kind> outputs, which raise on
    # collision). Every other class carries zeros — natural text has no
    # PII-shaped runs by construction, so a nonzero count on a non-pii
    # doc at probe scale is a false positive, the over-match defect
    # class ADVICE r7 flagged.
    def _pii_items(n_each: int) -> dict[str, list[str]]:
        def word() -> str:
            return vocab[int(rng.integers(len(vocab)))]

        def d(lo: int, hi: int) -> int:
            return int(rng.integers(lo, hi))

        phones = [
            lambda: f"{d(200, 999)}-{d(200, 999)}-{d(1000, 9999)}",
            lambda: f"({d(200, 999)}) {d(200, 999)}-{d(1000, 9999)}",
            lambda: f"+{d(1, 99)} {d(20, 99)} {d(1000, 9999)} {d(1000, 9999)}",
            lambda: f"+{d(10 ** 9, 10 ** 10)}",
            lambda: f"{d(100, 999)}.{d(100, 999)}.{d(1000, 9999)}",
        ]
        return {
            "email": [f"{word()}.{word()}@{word()}.com" for _ in range(n_each)],
            "ssn": [
                f"{d(100, 999)}-{d(10, 99)}-{d(1000, 9999)}"
                for _ in range(n_each)
            ],
            "ipv4": [
                f"{d(1, 255)}.{d(0, 255)}.{d(0, 255)}.{d(1, 255)}"
                for _ in range(n_each)
            ],
            "phone": [
                phones[int(rng.integers(len(phones)))]() for _ in range(n_each)
            ],
        }

    for _ in range(counts.get("pii", 0)):
        toks = _natural_tokens(rng, vocab, p, doc_len())
        truth: dict[str, int] = {}
        for kind, items in _pii_items(int(rng.integers(1, 4))).items():
            truth[f"want_n_{kind}"] = len(items)
            for item in items:
                toks.insert(int(rng.integers(len(toks) + 1)), item)
        add("pii", _render(toks))
        rows[-1].update(truth)
    for _ in range(counts["exact_dup"]):
        src = int(rng.integers(len(naturals)))
        add("exact_dup", naturals[src], dup_of=f"doc{src:05d}")
    for _ in range(counts["near_dup"]):
        src = int(rng.integers(len(naturals)))
        toks = naturals[src].split()
        for j in range(0, len(toks), 50):  # ~2% token edits
            toks[j] = vocab[int(rng.integers(len(vocab)))]
        add("near_dup", " ".join(toks), dup_of=f"doc{src:05d}")
    for r in rows:
        r.setdefault("dup_of", None)
        for kind in ("email", "ssn", "ipv4", "phone"):
            r.setdefault(f"want_n_{kind}", 0)
    return rows, benchmark
