from . import flash_attention
from .attention import causal_bias, mha, mha_chunked, padding_bias
from .flash_attention import flash_attention as flash_attention_op, mha_flash
from .grid_sample import (
    affine_warp,
    fixed_affine_matrix,
    random_affine_matrix,
    rotation_matrix,
    shear_matrix,
)
from .patch_ops import (
    apply_patch_batch,
    apply_patch_single,
    composite,
    composite_exact,
    paste_patch,
    paste_patch_scaled,
    quantize_patch_u8,
    random_placement,
    simulation_paste_patch,
)
