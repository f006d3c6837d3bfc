"""Deterministic hash-based corpus splitting (train/val/test).

Random-split is wrong for append-mostly corpora: a re-run after a new
crawl re-shuffles documents across splits and leaks yesterday's val set
into today's train. Hash splits are the standard fix — assignment is a
pure function of (stable key, seed), so it never changes as the corpus
grows, is identical on every executor/engine, and needs no state.

Engine-parity trick: the bucket is the FIRST 4 HEX CHARS of
``md5(key || seed)`` compared lexicographically against cumulative-weight
thresholds rendered as 4-digit hex. Lowercase fixed-width hex strings
order identically to their numeric values ('0' < ... < '9' < 'a' < ... <
'f'), so the comparison is exact in both Spark and DuckDB with no
hex-to-int conversion (which DuckDB lacks) and no floats. Resolution is
1/65536 per threshold — far finer than any practical split ratio.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _thresholds(weights: dict[str, float]) -> list[tuple[str, str]]:
    """[(split_name, exclusive upper bound as 4-hex-char string)] in order;
    the last split absorbs rounding so the bounds always cover [0, ffff]."""
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    names = list(weights)
    out, cum = [], 0.0
    for name in names[:-1]:
        cum += weights[name] / total
        out.append((name, format(min(0xFFFF, int(round(cum * 0x10000))), "04x")))
    out.append((names[-1], "ffff~"))  # '~' > 'f': unconditional catch-all
    return out


def split_column(key_col, weights: dict[str, float], seed: str = "") -> Column:
    """String split-name column. ``weights`` preserves insertion order;
    NULL keys get the last (catch-all) split deterministically."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    b = F.substring(
        F.md5(F.concat(F.coalesce(key.cast("string"), F.lit("")), F.lit(seed))), 1, 4
    )
    ths = _thresholds(weights)
    expr = None
    for name, bound in ths[:-1]:  # first matching (lowest) bound wins
        cond = b < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return F.lit(ths[0][0]) if expr is None else expr.otherwise(F.lit(ths[-1][0]))


def split_column_sql(expr: str, weights: dict[str, float], seed: str = "") -> str:
    """DuckDB twin generated from the same thresholds."""
    b = f"substr(md5(coalesce(CAST({expr} AS VARCHAR), '') || '{seed}'), 1, 4)"
    ths = _thresholds(weights)
    whens = " ".join(f"WHEN {b} < '{bound}' THEN '{name}'" for name, bound in ths[:-1])
    if not whens:
        return f"'{ths[0][0]}'"
    return f"(CASE {whens} ELSE '{ths[-1][0]}' END)"
