"""PII scrubbing — redaction of personal identifiers from training
text (north-star training-data op; the standard pre-release step every
published curation pipeline runs after quality filtering).

Design: pure whole-stage-codegen ``regexp_replace`` chains — zero
Python in the hot path, zero shuffles; cost is the scan, like the
Gopher gate. Patterns are deliberately restricted to the
RE2-compatible regex subset (no lookarounds, no backreferences) so the
SAME pattern text runs on Spark's Java regex and DuckDB's RE2 —
``tests/test_pii.py`` executes the twin chain in DuckDB and asserts
value equality, the repo's strongest cross-engine oracle form.

Scrub order is significant and fixed: ``email`` before ``phone`` (an
address's digit runs must not surface as phone hits once the local
part is redacted), ``ssn`` before ``phone`` (a 3-2-4 digit group
matches both; SSN is the more specific claim), ``ipv4`` before
``phone``. Counts are taken per kind ON THE TEXT AS ALREADY SCRUBBED
by earlier kinds, so every character is attributed to exactly one
kind and the per-kind counts sum cleanly.

At 100 TB: this is a projection — it composes into any one-pass
curation funnel (see ``plans/llm_ops.py``) without adding a stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: RE2-and-Java-portable patterns (ASCII classes, bounded quantifiers,
#: non-capturing groups only). Values are (pattern, replacement token).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    # Phone is precision-first: the earlier free-form character-class
    # pattern over-matched generic numeric runs (ISO dates/timestamps
    # like '2026-08-14 12' were rewritten as <PHONE>, destructively and
    # consistently across both engines, so the twin oracle could not
    # catch it). Now four structured shapes only:
    #   1. international, separated: '+' country code then 2-4
    #      separator-led digit groups (+44 20 7946 0958) — the leading
    #      separator is REQUIRED so '+2026-08-14'-style '+date' text
    #      cannot re-chunk into groups,
    #   2. international, glued: '+' then 8-14 digits (+491701234567),
    #   3. parenthesized area code, optional intl prefix
    #      (+1 (555) 123-4567, (555) 123-4567),
    #   4. separator-delimited 3 - 3/4 - 4 (555-123-4567, 020-7946-0958).
    # Bare unseparated digit runs are deliberately NOT claimed — a
    # 10-digit run is indistinguishable from an epoch timestamp or an
    # ID number, and scrubbing those corrupts training text.
    "phone": (
        r"\+\d{1,3}(?:[ .-]\d{2,4}){2,4}\b"
        r"|\+\d{8,14}\b"
        r"|(?:\+\d{1,3}[ .-]?)?\(\d{3}\)[ .-]?\d{3}[ .-]\d{4}\b"
        r"|\b\d{3}[ .-]\d{3,4}[ .-]\d{4}\b"
    ),
}

#: specificity order — see module docstring.
PII_ORDER = ("email", "ssn", "ipv4", "phone")


def pii_token(kind: str) -> str:
    return f"<{kind.upper()}>"


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    kinds: tuple[str, ...] = PII_ORDER,
    with_counts: bool = True,
) -> DataFrame:
    """Redact PII spans in ``text_col`` with ``<KIND>`` tokens.

    Output columns: ``out_col`` (defaults to replacing ``text_col``)
    plus, when ``with_counts``, one ``n_<kind>`` int per kind and
    ``pii_chars_removed`` — the number of ORIGINAL characters that were
    inside redacted spans (original length − scrubbed length + the
    inserted token lengths), which is ≥ 0 even when a token is longer
    than the span it replaced (``a@b.cc`` → ``<EMAIL>``). One codegen
    projection; no shuffle, no UDF."""
    out_col = out_col or text_col
    unknown = [k for k in kinds if k not in PII_PATTERNS]
    if unknown:
        raise ValueError(f"unknown PII kinds {unknown}; have {sorted(PII_PATTERNS)}")
    cols = [c for c in df.columns if c != out_col]
    if with_counts:
        added = [f"n_{k}" for k in kinds] + ["pii_chars_removed"]
        clash = sorted(set(added) & set(cols))
        if clash:
            raise ValueError(
                f"scrub_pii count columns {clash} already exist in the input; "
                "rename them or call with with_counts=False"
            )
    scrubbed: Column = F.col(text_col)
    counts: dict[str, Column] = {}
    for kind in kinds:
        pat = PII_PATTERNS[kind]
        if with_counts:
            # NULL text must count as 0, not NULL — NULL counts silently
            # vanish from downstream sums (the funnel's corpus totals).
            counts[kind] = F.coalesce(
                F.size(F.regexp_extract_all(scrubbed, F.lit(pat), F.lit(0))),
                F.lit(0),
            )
        scrubbed = F.regexp_replace(scrubbed, pat, pii_token(kind))
    proj = [F.col(c) for c in cols] + [scrubbed.alias(out_col)]
    if with_counts:
        proj += [counts[k].alias(f"n_{k}") for k in kinds]
        token_chars = sum(
            (counts[k] * len(pii_token(k)) for k in kinds), F.lit(0)
        )
        proj.append(
            F.coalesce(
                F.length(F.col(text_col)) - F.length(scrubbed) + token_chars,
                F.lit(0),
            ).alias("pii_chars_removed")
        )
    return df.select(*proj)


def pii_twin_sql(
    text_expr: str, kinds: tuple[str, ...] = PII_ORDER
) -> dict[str, str]:
    """The DuckDB twin of :func:`scrub_pii` as SQL expression strings —
    the SAME pattern text, global-replace flag 'g'. Returns
    {'scrubbed': expr, 'n_<kind>': expr, ...} for the oracle test (and
    any caller wanting the scrub inside a DuckDB pipeline)."""
    out: dict[str, str] = {}
    scrubbed = text_expr
    for kind in kinds:
        pat = PII_PATTERNS[kind].replace("'", "''")
        out[f"n_{kind}"] = (
            f"coalesce(len(regexp_extract_all({scrubbed}, '{pat}')), 0)"
        )
        scrubbed = (
            f"regexp_replace({scrubbed}, '{pat}', '{pii_token(kind)}', 'g')"
        )
    out["scrubbed"] = scrubbed
    return out
