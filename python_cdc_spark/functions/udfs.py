"""UDF surface (E29): the escape hatches, in preference order.

1. Built-in expressions (everything else in ``functions/``) — JVM,
   whole-stage codegen, the only hot-path choice.
2. Arrow-batched ``pandas_udf`` — vectorized numpy over columnar
   batches; 10–100× faster than row UDFs. Use when the math genuinely
   needs numpy/scipy.
3. Python UDTF — one row in, many rows out, with Python state.
4. Row-at-a-time ``F.udf`` — provided for completeness; never put it
   on a 100 TB path.

All constructors are lazy (registering a UDF requires an active
SparkSession, so module import must stay side-effect free).

The pandas cosine is the *alternative implementation* of
``functions.vectors.cosine_similarity`` used to cross-check the
expression version in tests (two independent paths, same numbers).
"""

from __future__ import annotations

from functools import lru_cache

# module-level so pyspark can resolve the (stringified) type hints of
# the nested pandas UDFs against this module's globals
import numpy as np  # noqa: F401
import pandas as pd  # noqa: F401


@lru_cache(maxsize=None)
def cosine_pandas():
    """Vectorized cosine over two array<float> columns (Arrow batches)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cosine(a: pd.Series, b: pd.Series) -> pd.Series:
        av = np.stack(a.to_numpy())
        bv = np.stack(b.to_numpy())
        num = (av * bv).sum(axis=1)
        den = np.sqrt((av * av).sum(axis=1)) * np.sqrt((bv * bv).sum(axis=1))
        return pd.Series(num / den)

    return _cosine


@lru_cache(maxsize=None)
def weighted_mean_pandas():
    """Grouped-aggregate pandas UDF: Σ(v·w)/Σ(w) per group."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _wmean(v: pd.Series, w: pd.Series) -> float:
        wv = w.to_numpy()
        return float(np.dot(v.to_numpy(), wv) / wv.sum()) if wv.sum() else float("nan")

    return _wmean


@lru_cache(maxsize=None)
def slug_udf():
    """Row-at-a-time example (deliberately trivial): lowercase-dashed."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.udf(T.StringType())
    def _slug(s: str) -> str:
        return "-".join(s.lower().split()) if s is not None else None

    return _slug


def token_udtf_class():
    """Python UDTF: text → (position, token) rows."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class TokenExplode:
        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.split()):
                yield (i, tok)

    return TokenExplode
