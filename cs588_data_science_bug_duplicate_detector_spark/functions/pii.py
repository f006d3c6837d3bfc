"""PII masking for webtext: emails, IPv4 addresses, phone numbers.

Training-data pipelines scrub contact PII before anything ships
(CCNet/Dolma-style email/IP/phone masking); the reference has no PII
handling (its corpus is bug reports already stripped). Same design as
``functions/urls.py``: every pattern is deliberately restricted to the
Java-regex ∩ RE2 common subset (character classes, bounded quantifiers,
``\\b`` word boundaries — no lookarounds, no backrefs), so the DuckDB
oracle reproduces each step with the identical pattern string and the
``'g'`` flag. Pure Catalyst ``regexp_replace`` / ``regexp_count`` chains
— whole-stage codegen, no UDF, scale-free.

Pattern notes (conservative by design — a dedup corpus tool must not
shred ordinary numerics):

- EMAIL: the practical local@domain.tld shape; masked FIRST so its
  digit runs can never be half-eaten by the phone patterns.
- IPV4: four 1-3 digit octets with word boundaries. No range check
  (999.1.1.1 masks too) — over-masking a malformed IP is the safe side.
- PHONE: three explicit shapes rather than one greedy catch-all:
  E.164 compact (``+4915123456789``), international spaced/dashed
  groups, and North-American ``(555) 123-4567`` / ``555-123-4567``.
  Bare long digit runs (order ids, timestamps) are deliberately NOT
  matched.

Masking order is load-bearing: EMAIL -> IPV4 -> PHONE (emails contain
dots+digits an IP pattern could clip; IPs contain digit groups the
spaced-phone pattern could clip). ``pii_counts`` therefore counts on the
ORIGINAL text per family, in the same order, masking each family out
before counting the next — counts always equal what ``mask_pii``
replaces.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (family, pattern, replacement) — applied in order; patterns are
# Java-regex and RE2 compatible, mirrored verbatim by the DuckDB twin.
PII_STEPS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # +E.164 compact, then international with separators, then NANP
    ("phone", r"\+\d{7,15}\b", "<PHONE>"),
    ("phone", r"\+\d{1,3}([ .\-]\d{2,4}){2,4}\b", "<PHONE>"),
    ("phone", r"\(\d{3}\) ?\d{3}[.\-]?\d{4}\b", "<PHONE>"),
    ("phone", r"\b\d{3}[.\-]\d{3}[.\-]\d{4}\b", "<PHONE>"),
]

PII_FAMILIES = ("email", "ipv4", "phone")


def mask_pii(col) -> Column:
    """Masked form of a text column (NULL stays NULL)."""
    out = F.col(col) if isinstance(col, str) else col
    for _fam, pat, repl in PII_STEPS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(col) -> dict[str, Column]:
    """{family: count column} — how many spans ``mask_pii`` would replace
    per family. Counted family-by-family on progressively-masked text so
    overlapping shapes (an IP inside a spaced phone candidate) are
    attributed exactly once, to the same family the masker gives them."""
    # NULL text counts as zero PII spans (not NULL): a corpus audit must
    # put NULL-text docs in the "0 findings" bucket, not drop them — same
    # contract as cleanup.chars_removed and gopher_columns
    cur = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    counts: dict[str, Column] = {}
    for fam in PII_FAMILIES:
        n = F.lit(0)
        for f, pat, repl in PII_STEPS:
            if f == fam:
                n = n + F.regexp_count(cur, F.lit(pat))
                cur = F.regexp_replace(cur, pat, repl)
        counts[fam] = n
    return counts


def _sql_quote(pat: str) -> str:
    return pat.replace("'", "''")


def mask_pii_sql(expr: str) -> str:
    """DuckDB twin of :func:`mask_pii` over a SQL expression."""
    out = expr
    for _fam, pat, repl in PII_STEPS:
        out = f"regexp_replace({out}, '{_sql_quote(pat)}', '{repl}', 'g')"
    return out


def pii_counts_sql(expr: str) -> dict[str, str]:
    """DuckDB twins of :func:`pii_counts` (same progressive masking, same
    NULL-counts-as-zero contract)."""
    cur = f"coalesce({expr}, '')"
    counts: dict[str, str] = {}
    for fam in PII_FAMILIES:
        terms = []
        for f, pat, repl in PII_STEPS:
            if f == fam:
                terms.append(f"len(regexp_extract_all({cur}, '{_sql_quote(pat)}'))")
                cur = f"regexp_replace({cur}, '{_sql_quote(pat)}', '{repl}', 'g')"
        counts[fam] = " + ".join(terms) if terms else "0"
    return counts
