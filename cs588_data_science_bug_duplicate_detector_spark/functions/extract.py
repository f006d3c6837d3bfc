"""HTML -> text extraction (input_hint: html is an opaque binary column).

One Arrow-batched pandas UDF, vectorized pandas string ops only.
The per-url BYTE-IDENTITY invariant (BASELINE.json input_hint) is tested by
comparing sha256 of the extracted column against the stored ``text`` column
for the synthetic corpus, and by re-running extraction twice.

A real deployment would swap ``_extract_main`` for a proper HTML parser;
the Spark-side plumbing (binary in, string out, batch shape) is the
contract and is identical.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


def _extract_main(html: pd.Series) -> pd.Series:
    # bytes -> str; invalid utf-8 replaced deterministically
    s = html.map(lambda b: b.decode("utf-8", "replace") if b is not None else "")
    # (?s): real pages put newlines inside <main> — without DOTALL they
    # silently extract as empty and vanish from dedup
    body = s.str.extract(r"(?s)<main>(.*?)</main>", expand=False)
    return body.fillna("")


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return _extract_main(html)


def with_extracted_text(df: DataFrame, html_col: str = "html", out_col: str = "text") -> DataFrame:
    """coalesce(existing text, extract(html)) — extraction only runs where needed."""
    extracted = extract_text_udf(F.col(html_col))
    if out_col in df.columns:
        blank = F.col(out_col).isNull() | (F.col(out_col) == "")
        return df.withColumn(out_col, F.when(blank, extracted).otherwise(F.col(out_col)))
    return df.withColumn(out_col, extracted)
