from .config import (
    DINOV2_VIT_L,
    LLAMA2_7B,
    OPENVLA_7B,
    PHI_2,
    REGISTRY,
    SIGLIP_SO400M,
    TINY_LLAMA,
    VLA_TINY,
    LlamaConfig,
    PhiConfig,
    ViTConfig,
    VLAConfig,
    get_config,
)
from .llama import (
    cross_entropy_loss,
    embed_tokens,
    init_llama_params,
    llama_apply,
    rms_norm,
)
from .vit import init_vit_params, vit_features
from .vlm import (
    VLAOutput,
    action_logit_slice,
    init_vla_params,
    param_count,
    projector_apply,
    vision_features,
    vla_forward,
)
from .convert import convert_state_dict, load_checkpoint_dir, load_norm_stats
from .phi import convert_phi, init_phi_params, phi_apply
from .registry import (
    GLOBAL_REGISTRY,
    MODEL_REGISTRY,
    ModelSpec,
    UnsupportedArchitecture,
    available_model_names,
    available_models,
    build_config,
    get_model_description,
    hub_files,
    load,
    make_image_processor,
)
