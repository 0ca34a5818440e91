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


@F.pandas_udf(T.DoubleType())
def weighted_mean_pandas(v: pd.Series, w: pd.Series) -> float:
    """GROUPED_AGG pandas UDF (r04 — the one Arrow-UDF flavor the
    surface map lacked): a whole group's values arrive as Series, ONE
    scalar returns. Usable in ``groupBy().agg()`` AND as a window
    aggregate (``.over(Window.partitionBy(...))``). Spark plans it as
    partial-less ``AggregateInPandas`` — the group's rows ship to one
    Python worker, so unlike JVM declarative aggregates there is NO
    map-side combine; keep it for aggregates expressions can't state
    (here the twin test pins it against the expressible
    sum(v*w)/sum(w), which production code should prefer).

    NULL semantics replicate the twin — note the two sums skip
    DIFFERENT row sets: sum(v*w) skips rows where either side is NULL,
    sum(w) skips only NULL weights; an all-NULL sum is NULL (not 0).
    ONE pinned difference: on sum(w)==0 the raw twin RAISES
    DIVIDE_BY_ZERO under Spark 4's ANSI default; this UDF instead
    matches the try_divide twin — sum(v*w) `try_divide` sum(w) — and
    returns NULL (a NaN scalar could not cross the Arrow boundary
    anyway: it arrives as NULL).
    Arrow also hands NULL inputs to pandas as NaN, so true-NaN data is
    indistinguishable from NULL here (the documented pandas-UDF
    caveat)."""
    vv = v.to_numpy(dtype=np.float64, na_value=np.nan)
    ww = w.to_numpy(dtype=np.float64, na_value=np.nan)
    prod = vv * ww
    prod_mask = ~np.isnan(prod)
    w_mask = ~np.isnan(ww)
    if not prod_mask.any() or not w_mask.any():
        return None  # SQL: sum over zero non-NULL rows is NULL
    den = ww[w_mask].sum()
    if den == 0.0:
        return None  # twin: IEEE NaN — unrepresentable through Arrow
    return float(prod[prod_mask].sum() / den)


# --- Arrow-native UDF (Spark 4.1 @arrow_udf): the newest escape hatch —
# the kernel receives pyarrow arrays directly (no pandas conversion on
# either side), halving the serialization overhead of a pandas_udf for
# numeric work. Same rule applies: hot paths stay expressions; this
# exists as the sanctioned pattern + parity proof.
try:  # pragma: no cover - availability guard for older PySpark
    import pyarrow as _pa

    @F.arrow_udf(T.DoubleType())
    def sq_dist_arrow(a: "_pa.Array", b: "_pa.Array") -> "_pa.Array":
        """Squared euclidean distance over two array<double> columns,
        computed on Arrow buffers via numpy views (zero-copy in, one
        allocation out)."""
        import numpy as np

        out = []
        for x, y in zip(a.to_pylist(), b.to_pylist()):
            xv = np.asarray(x, dtype=np.float64)
            yv = np.asarray(y, dtype=np.float64)
            d = xv - yv
            out.append(float(np.dot(d, d)))
        return _pa.array(out, type=_pa.float64())

    HAS_ARROW_UDF = True
except AttributeError:  # older Spark without arrow_udf
    HAS_ARROW_UDF = False
