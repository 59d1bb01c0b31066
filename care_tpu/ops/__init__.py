from care_tpu.ops.attention import (
    dot_product_attention,
    NEG_INF,
)

__all__ = ["dot_product_attention", "NEG_INF"]
