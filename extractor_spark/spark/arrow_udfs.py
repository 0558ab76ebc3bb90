"""Type-hinted pandas UDF factories.

This module deliberately has NO ``from __future__ import annotations``:
pyspark's pandas_udf eval-type inference reads real annotation objects,
and PEP 563 string annotations defeat it (queries.py uses future
annotations module-wide, so UDFs needing hint inference live here).
The legacy ``PandasUDFType.SCALAR`` constant this replaces is deprecated
on Spark 4 (ADVICE round 3).
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


def bloom_probe_udf(bc):
    """Vectorized Bloom-membership probe over k precomputed bit positions.

    ``bc`` broadcasts a bit-packed uint8 bitmap (LSB-first within each
    byte: bit ``pos`` lives at ``bitmap[pos >> 3]`` bit ``pos & 7``).
    Returns True only when ALL k positions are set (possible member).
    """

    @pandas_udf("boolean")
    def might_contain(
        p0: pd.Series, p1: pd.Series, p2: pd.Series, p3: pd.Series, p4: pd.Series
    ) -> pd.Series:
        bm = bc.value
        pos = p0.to_numpy()
        hit = (bm[pos >> 3] >> (pos & 7)) & 1
        for p in (p1, p2, p3, p4):
            pos = p.to_numpy()
            hit = hit & ((bm[pos >> 3] >> (pos & 7)) & 1)
        return pd.Series(hit.astype(bool))

    return might_contain


def mean_vec_udf():
    """Grouped-agg pandas UDF: Series-of-arrays → element-wise mean array.
    Type-hinted form (Series → scalar annotation ⇒ GROUPED_AGG) replacing
    the deprecated PandasUDFType.GROUPED_AGG constant (SPARK-28264)."""

    @pandas_udf("array<double>")
    def mean_vec(embs: pd.Series) -> list:
        return np.mean(np.stack(embs.to_numpy()), axis=0).tolist()

    return mean_vec


def canonical_url_udf():
    """Scalar pandas UDF: url Series → canonical-url Series (Arrow batches;
    the per-url work is a pure string function).  Type-hinted form
    replacing the deprecated PandasUDFType.SCALAR constant."""

    @pandas_udf("string")
    def _canon(urls: pd.Series) -> pd.Series:
        from extractor_spark.engine.urlnorm import canonical_url

        return urls.map(canonical_url)

    return _canon


def sanitize_text_udf():
    """Scalar pandas UDF over Arrow batches wrapping
    engine.textclean.sanitize_text (ftfy-lite: mojibake repair + NFC +
    control/zero-width strip).  Returns a struct so the cleaned text and
    both repair counters come out of ONE pass over the corpus — callers
    project the fields they need and Catalyst prunes the rest."""

    @pandas_udf("struct<clean:string, repairs:int, removed:int>")
    def _sanitize(texts: pd.Series) -> pd.DataFrame:
        from extractor_spark.engine.textclean import sanitize_text

        out = texts.map(lambda s: sanitize_text(s if s is not None else ""))
        return pd.DataFrame(
            {
                "clean": out.map(lambda t: t[0]),
                "repairs": out.map(lambda t: t[1]).astype("int32"),
                "removed": out.map(lambda t: t[2]).astype("int32"),
            }
        )

    return _sanitize


__all__ = [
    "bloom_probe_udf",
    "mean_vec_udf",
    "canonical_url_udf",
    "sanitize_text_udf",
    "np",
    "pd",
]
