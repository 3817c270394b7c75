from .attention_dispatch import dot_product_attention

__all__ = ["dot_product_attention"]
