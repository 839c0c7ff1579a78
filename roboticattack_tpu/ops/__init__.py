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
