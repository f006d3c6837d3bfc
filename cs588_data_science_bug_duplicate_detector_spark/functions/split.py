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
        v = int(round(cum * 0x10000))
        # cum == 1.0 must be UNCONDITIONAL ('g' > 'f' in every bucket), not
        # capped to 'ffff' — capping leaked bucket 'ffff' (1/65536 of the
        # corpus) into a zero-weight trailing split
        out.append((name, format(v, "04x") if v <= 0xFFFF else "g"))
    out.append((names[-1], "g"))  # unconditional catch-all
    return out


def split_column(key_col, weights: dict[str, float], seed: str = "") -> Column:
    """String split-name column. ``weights`` preserves insertion order;
    NULL keys get the LAST (catch-all) split — explicitly, not by hashing
    an empty string (that would drop keyless docs into a seed-dependent
    split, leaking them into train under some seeds)."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    b = F.substring(F.md5(F.concat(key.cast("string"), F.lit(seed))), 1, 4)
    ths = _thresholds(weights)
    chain = None
    for name, bound in ths[:-1]:  # first matching (lowest) bound wins
        cond = b < F.lit(bound)
        chain = F.when(cond, F.lit(name)) if chain is None else chain.when(cond, F.lit(name))
    chain = F.lit(ths[0][0]) if chain is None else chain.otherwise(F.lit(ths[-1][0]))
    return F.when(key.isNull(), F.lit(ths[-1][0])).otherwise(chain)


def split_column_sql(expr: str, weights: dict[str, float], seed: str = "") -> str:
    """DuckDB twin generated from the same thresholds (same NULL contract)."""
    b = f"substr(md5(CAST({expr} AS VARCHAR) || '{seed}'), 1, 4)"
    ths = _thresholds(weights)
    null_when = f"WHEN {expr} IS NULL THEN '{ths[-1][0]}'"
    whens = " ".join(f"WHEN {b} < '{bound}' THEN '{name}'" for name, bound in ths[:-1])
    if not whens:
        return f"(CASE {null_when} ELSE '{ths[0][0]}' END)"
    return f"(CASE {null_when} {whens} ELSE '{ths[-1][0]}' END)"
