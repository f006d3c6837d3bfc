"""Text normalization for crawled pages: control characters, exotic
unicode whitespace, zero-width characters, runaway blank runs.

HTML extraction leaves NBSPs, zero-width joiners, stray C0 controls and
tower-of-newlines artifacts in most real crawl text; every production
pipeline normalizes these before tokenization (they fragment shingles
and corrupt dedup keys: ``word\\u00A0word`` is one token to a human and
two garbage tokens to ``tokenize``). Same engine-parity discipline as
``urls.py``/``pii.py``: ordered ``regexp_replace`` steps in the
Java∩RE2 subset, the DuckDB twin generated from the SAME step list.

Step order is load-bearing: zero-widths are DELETED before space
normalization (``wo\\u200Brd`` must rejoin as ``word``, not split),
unicode spaces become ASCII spaces before runs collapse, controls are
dropped before the newline-run collapse so ``\\n\\x00\\n\\n`` counts as
one run.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Unicode class members are embedded as LITERAL characters (identical
# semantics in Java regex and RE2); built from chr() so the codepoints
# are explicit in source. \xNN escapes are shared syntax.
_ZERO_WIDTH = "".join(chr(c) for c in (0x200B, 0x200C, 0x200D, 0xFEFF))
_UNI_SPACES = (
    chr(0x00A0)                                        # NBSP
    + "".join(chr(c) for c in range(0x2000, 0x200B))   # en/em/thin/hair...
    + chr(0x202F) + chr(0x205F) + chr(0x3000)          # narrow NBSP, math, CJK
)

# (pattern, replacement), applied in order.
CLEANUP_STEPS: list[tuple[str, str]] = [
    # zero-width space/joiners + BOM: delete
    (f"[{_ZERO_WIDTH}]", ""),
    # exotic horizontal whitespace -> ASCII space
    (f"[{_UNI_SPACES}]", " "),
    # C0 controls (except \t \n \r) + DEL: delete
    (r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", ""),
    # trailing spaces/tabs before a newline
    (r"[ \t]+\n", "\n"),
    # 3+ newlines (paragraph towers) -> exactly 2
    (r"\n{3,}", "\n\n"),
    # space/tab runs -> one space
    (r"[ \t]{2,}", " "),
    # leading / trailing whitespace of the whole doc
    (r"^[ \t\n\r]+", ""),
    (r"[ \t\n\r]+$", ""),
]


def clean_text(col) -> Column:
    """Normalized form of a text column (NULL stays NULL)."""
    out = F.col(col) if isinstance(col, str) else col
    for pat, repl in CLEANUP_STEPS:
        out = F.regexp_replace(out, pat, repl)
    return out


def chars_removed(col) -> Column:
    """How many characters normalization dropped (0 for NULL)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.length(c) - F.length(clean_text(c)), F.lit(0)
    ).cast("long")


def clean_text_sql(expr: str) -> str:
    """DuckDB twin of :func:`clean_text`, generated from CLEANUP_STEPS."""
    out = expr
    for pat, repl in CLEANUP_STEPS:
        p = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{repl}', 'g')"
    return out


def chars_removed_sql(expr: str) -> str:
    return (
        f"CAST(coalesce(length({expr}) - length({clean_text_sql(expr)}), 0) AS BIGINT)"
    )
