"""Python user-defined table functions (Spark 4 UDTF API): one input row →
many output rows, registered into the SQL surface for LATERAL use.

The explode/posexplode family covers array expansion natively (and is the
fast path — see F17); a UDTF is the escape hatch when row expansion needs
arbitrary Python per row (tokenizers with state, parsers, generators). The
shipped example splits text into (pos, token) rows — semantics identical to
``posexplode(split(...))`` so the DuckDB oracle can pin it exactly.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

__all__ = ["SplitTokens", "register_udtfs"]


@udtf(returnType="pos int, token string")
class SplitTokens:
    """LATERAL split_tokens(text): one row per whitespace token."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        for i, tok in enumerate(text.split(" ")):
            yield i, tok


def register_udtfs(spark: SparkSession) -> list[str]:
    """Register the engine's UDTFs into the session's SQL surface."""
    spark.udtf.register("split_tokens", SplitTokens)
    return ["split_tokens"]


from hiss_cube_spark._serde import register_self as _register_self  # noqa: E402

_register_self(__name__)
