"""Vector expressions over ``array<float>`` embedding columns.

No reference-side counterpart; these back the similarity-search extension
(SURVEY.md §7.4). All JVM-side higher-order functions (``zip_with`` /
``aggregate``) — no UDFs in the hot path.

Determinism note: float fold order inside one array is fixed (left fold), but
cross-engine bit-parity for oracle checks is achieved via
:func:`quantize_vec` — int-quantized dot products are exact in any engine.
Integer quantization is also the standard memory/bandwidth optimization for
ANN at scale (int8/int16 codes), so the oracle path and the scale path agree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

QUANT_SCALE = 10_000  # 4 fractional digits survive quantization


def quantize_vec(col: Column | str, scale: int = QUANT_SCALE) -> Column:
    """array<float> → array<long> by round(x*scale) — exact cross-engine math."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: F.round(x.cast("double") * scale).cast("long"))


def dot_product(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (whole-stage codegen, no shuffle)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    """Euclidean norm of an array column."""
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot_product(a, b) / denom)
