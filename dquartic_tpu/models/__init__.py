from .unet1d import UNet1d
from .transformer import CustomTransformer
from .attention import Attention, LinearAttention, HybridSelfAndCrossAttention, Transformer1d, rope_rotate
from .fourier import FourierFeatures
from . import layers

__all__ = [
    "UNet1d",
    "CustomTransformer",
    "FourierFeatures",
    "Attention",
    "LinearAttention",
    "HybridSelfAndCrossAttention",
    "Transformer1d",
    "rope_rotate",
    "layers",
]
