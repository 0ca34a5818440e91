"""Pandas-UDF (Arrow) escape hatch.

The engine's rule (SURVEY.md §2.9 U1/U6): custom logic is a Catalyst
expression first; a vectorized pandas_udf ONLY when expressions genuinely
cannot express the semantics. These are the sanctioned fallbacks — each has
an expression-equivalent in functions/arrays.py that the tests assert
against, so the slow path can never silently drift from the fast path.

The reference contemplated this surface but never used it (dead
``pandas_udf`` import at codeText.txt:8).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.DoubleType())
def euclidean_pandas(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched Euclidean distance between two array columns —
    vectorized escape hatch for functions.arrays.euclidean."""
    av = np.stack(a.to_numpy())
    bv = np.stack(b.to_numpy())
    return pd.Series(np.sqrt(((av - bv) ** 2).sum(axis=1)))


@F.pandas_udf(T.DoubleType())
def cosine_pandas(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched cosine similarity — escape hatch for
    functions.arrays.cosine_similarity."""
    av = np.stack(a.to_numpy()).astype(np.float64)
    bv = np.stack(b.to_numpy()).astype(np.float64)
    num = (av * bv).sum(axis=1)
    den = np.linalg.norm(av, axis=1) * np.linalg.norm(bv, axis=1)
    out = np.where(den == 0, 0.0, num / np.where(den == 0, 1.0, den))
    return pd.Series(out)
