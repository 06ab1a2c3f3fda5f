from .init import trunc_normal_init
from .pad import pad2d
from .resize import resize_bilinear, resize_nearest, upsample2d, adaptive_avg_pool2d
from .window import (
    window_partition,
    window_reverse,
    shifted_window_attn_mask,
    num_windows,
)
from .drop import DropPath
from .conv import ConvBN
from .mlp import SwinMLP, PreNormFF, PreNormDWConvFF
from .attention import WindowAttention, MultiHeadAttention
from .ordered_attention import PreNormOrderedSwinSA
from .ppm import PyramidPoolingModule
