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


__all__ = ["bloom_probe_udf", "np", "pd"]
