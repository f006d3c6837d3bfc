"""Gopher-style document quality rules (Rae et al. 2021, Table A1).

The rule set every large webtext pipeline applies between extraction and
dedup: word-count band, mean-word-length band, symbol-to-word ratio,
bullet-line and ellipsis-line fractions, alphabetic-word fraction, and a
minimum stop-word hit count. The reference has no quality filtering (its
corpus is curated bug reports); here each rule is a named boolean column
plus ``passes_gopher`` (their conjunction), all pure Catalyst — array
lambdas over a single tokenization, whole-stage codegen, no UDF.

Engine-parity design (same discipline as ``urls.py``/``pii.py``):

- Every fraction threshold is evaluated by INTEGER cross-multiplication
  (``10 * n_bullet_lines <= n_lines`` instead of ``n_bullet/n_lines <=
  0.1``): no floats ever materialize, so the DuckDB twin is bit-stable
  and ANSI-mode division-by-zero can never throw on empty docs.
- Words split on an EXPLICIT whitespace class ``[ \\t\\n\\r]`` (Java
  ``\\s`` and RE2 ``\\s`` disagree on ``\\x0B``), empties filtered.
- Zero-word / NULL docs fail the word-count rule and every other rule is
  evaluated on the empty set (vacuous integer comparisons), identically
  in both engines.

Thresholds live in one ``GOPHER_BOUNDS`` dict consumed by BOTH the Spark
expressions and the generated DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

GOPHER_BOUNDS = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3,   # 3 <= total_chars/n_words <= 10
    "max_mean_word_len": 10,
    "symbol_ratio_x10": 1,    # (n_hash + n_ellipsis) / n_words <= 0.1
    "bullet_ratio_x10": 1,    # bullet-start lines / lines <= 0.1
    "ellipsis_ratio_x10": 3,  # ellipsis-end lines / lines <= 0.3
    "alpha_ratio_x10": 8,     # words containing [A-Za-z] / words >= 0.8
    "min_stop_hits": 2,
}

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

_WS = r"[ \t\n\r]+"


def _words(col: Column) -> Column:
    return F.filter(F.split(F.coalesce(col, F.lit("")), _WS), lambda x: x != "")


def gopher_columns(col) -> dict[str, Column]:
    """{name: column} — integer counts first, then the rule booleans and
    ``passes_gopher``. Select them all for the full report, or just
    ``passes_gopher`` for a filter."""
    c = F.col(col) if isinstance(col, str) else col
    b = GOPHER_BOUNDS
    w = _words(c)
    n_words = F.size(w).cast("long")
    total_chars = F.aggregate(w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
    nn = F.coalesce(c, F.lit(""))  # NULL text: all counts 0, not NULL
    n_symbols = (
        F.regexp_count(nn, F.lit(r"#")) + F.regexp_count(nn, F.lit(r"\.\.\."))
    ).cast("long")
    lines = F.filter(
        F.split(F.coalesce(c, F.lit("")), r"\n"), lambda x: F.trim(x) != ""
    )
    n_lines = F.size(lines).cast("long")
    n_bullet_lines = F.size(
        F.filter(
            lines,
            lambda x: F.ltrim(x).startswith("- ")
            | F.ltrim(x).startswith("* ")
            | F.ltrim(x).startswith("•"),
        )
    ).cast("long")
    n_ellipsis_lines = F.size(
        F.filter(
            lines,
            lambda x: F.rtrim(x).endswith("...") | F.rtrim(x).endswith("…"),
        )
    ).cast("long")
    n_alpha_words = F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]"))).cast("long")
    sw = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    n_stop_hits = F.size(F.filter(w, lambda x: F.array_contains(sw, F.lower(x)))).cast("long")

    cols: dict[str, Column] = {
        "n_words": n_words,
        "total_word_chars": total_chars,
        "n_symbols": n_symbols,
        "n_lines": n_lines,
        "n_bullet_lines": n_bullet_lines,
        "n_ellipsis_lines": n_ellipsis_lines,
        "n_alpha_words": n_alpha_words,
        "n_stop_hits": n_stop_hits,
        "r_word_count": (n_words >= b["min_words"]) & (n_words <= b["max_words"]),
        "r_mean_word_len": (total_chars >= b["min_mean_word_len"] * n_words)
        & (total_chars <= b["max_mean_word_len"] * n_words)
        & (n_words > 0),
        # Gopher filters docs with ratio > 0.1, so exactly-0.1 PASSES (<=)
        "r_symbol_ratio": F.lit(10) * n_symbols <= b["symbol_ratio_x10"] * n_words,
        "r_bullet_lines": F.lit(10) * n_bullet_lines <= b["bullet_ratio_x10"] * n_lines,
        "r_ellipsis_lines": F.lit(10) * n_ellipsis_lines <= b["ellipsis_ratio_x10"] * n_lines,
        "r_alpha_words": F.lit(10) * n_alpha_words >= b["alpha_ratio_x10"] * n_words,
        "r_stop_words": n_stop_hits >= b["min_stop_hits"],
    }
    cols["passes_gopher"] = (
        cols["r_word_count"]
        & cols["r_mean_word_len"]
        & cols["r_symbol_ratio"]
        & cols["r_bullet_lines"]
        & cols["r_ellipsis_lines"]
        & cols["r_alpha_words"]
        & cols["r_stop_words"]
    )
    return cols


def gopher_columns_sql(expr: str) -> dict[str, str]:
    """DuckDB twins of :func:`gopher_columns`, generated from the SAME
    GOPHER_BOUNDS/GOPHER_STOPWORDS constants."""
    b = GOPHER_BOUNDS
    w = f"list_filter(regexp_split_to_array(coalesce({expr}, ''), '{_WS}'), x -> x <> '')"
    lines = (
        f"list_filter(regexp_split_to_array(coalesce({expr}, ''), '\\n'), x -> trim(x) <> '')"
    )
    sw = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    cols = {
        "n_words": f"CAST(len({w}) AS BIGINT)",
        "total_word_chars": f"CAST(coalesce(list_sum(list_transform({w}, x -> length(x))), 0) AS BIGINT)",
        "n_symbols": (
            f"CAST(len(regexp_extract_all(coalesce({expr}, ''), '#'))"
            f" + len(regexp_extract_all(coalesce({expr}, ''), '\\.\\.\\.')) AS BIGINT)"
        ),
        "n_lines": f"CAST(len({lines}) AS BIGINT)",
        "n_bullet_lines": (
            f"CAST(len(list_filter({lines}, x -> starts_with(ltrim(x), '- ')"
            f" OR starts_with(ltrim(x), '* ') OR starts_with(ltrim(x), chr(8226)))) AS BIGINT)"
        ),
        "n_ellipsis_lines": (
            f"CAST(len(list_filter({lines}, x -> ends_with(rtrim(x), '...')"
            f" OR ends_with(rtrim(x), chr(8230)))) AS BIGINT)"
        ),
        "n_alpha_words": (
            f"CAST(len(list_filter({w}, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT)"
        ),
        "n_stop_hits": (
            f"CAST(len(list_filter({w}, x -> list_contains([{sw}], lower(x)))) AS BIGINT)"
        ),
    }
    cols["r_word_count"] = (
        f"({cols['n_words']} >= {b['min_words']} AND {cols['n_words']} <= {b['max_words']})"
    )
    cols["r_mean_word_len"] = (
        f"({cols['total_word_chars']} >= {b['min_mean_word_len']} * {cols['n_words']}"
        f" AND {cols['total_word_chars']} <= {b['max_mean_word_len']} * {cols['n_words']}"
        f" AND {cols['n_words']} > 0)"
    )
    cols["r_symbol_ratio"] = f"(10 * {cols['n_symbols']} <= {b['symbol_ratio_x10']} * {cols['n_words']})"
    cols["r_bullet_lines"] = (
        f"(10 * {cols['n_bullet_lines']} <= {b['bullet_ratio_x10']} * {cols['n_lines']})"
    )
    cols["r_ellipsis_lines"] = (
        f"(10 * {cols['n_ellipsis_lines']} <= {b['ellipsis_ratio_x10']} * {cols['n_lines']})"
    )
    cols["r_alpha_words"] = (
        f"(10 * {cols['n_alpha_words']} >= {b['alpha_ratio_x10']} * {cols['n_words']})"
    )
    cols["r_stop_words"] = f"({cols['n_stop_hits']} >= {b['min_stop_hits']})"
    cols["passes_gopher"] = (
        f"({cols['r_word_count']} AND {cols['r_mean_word_len']} AND {cols['r_symbol_ratio']}"
        f" AND {cols['r_bullet_lines']} AND {cols['r_ellipsis_lines']}"
        f" AND {cols['r_alpha_words']} AND {cols['r_stop_words']})"
    )
    return cols
