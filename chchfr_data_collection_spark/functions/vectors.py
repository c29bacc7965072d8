"""Vector/embedding column functions — native higher-order expressions.

Embeddings are `array<float>` columns. Everything here stays JVM-side
(zip_with / aggregate over arrays); no Python in the hot path.

Cross-engine-exact variant: element-wise products are computed in
DECIMAL(18,9) (exact, order-independent sums) so a DuckDB oracle
reproduces the same doubles bit-for-bit; the fast double variants are
for production use where an oracle isn't being matched.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Double-precision dot product (fast path)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


# Quantization scale for cross-engine-exact vector math. Embedding
# floats are quantized to round(x * 1e6) as int64; every product and sum
# is then integer-exact and order-independent, and round(double) agrees
# across engines (both round half away from zero). 64-dim products at
# |x| <~ 8 stay far below int64 range. The scale cancels in cosine.
QUANT = 1_000_000.0


def quantize(a: Column | str) -> Column:
    """array<float> -> array<bigint>: round(x * 1e6)."""
    return F.transform(
        _c(a), lambda x: F.round(x.cast("double") * F.lit(QUANT)).cast("bigint")
    )


def dot_exact(a: Column | str, b: Column | str) -> Column:
    """Integer-exact quantized dot product (units of 1e-12 of true scale)."""
    prods = F.zip_with(quantize(a), quantize(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0).cast("bigint"), lambda acc, v: acc + v)


def cosine_exact(a: Column | str, b: Column | str) -> Column:
    """Cosine over the quantized vectors: integer dots/norms, then IEEE
    sqrt+divide — any engine computing this recipe produces the same
    double bit-for-bit (the 1e6 quantization scale cancels)."""
    return dot_exact(a, b).cast("double") / (
        F.sqrt(dot_exact(a, a).cast("double")) * F.sqrt(dot_exact(b, b).cast("double"))
    )
