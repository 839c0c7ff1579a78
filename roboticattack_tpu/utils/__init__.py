from . import constants
from .action_tokenizer import (
    BINS,
    BIN_CENTERS,
    decode_tokens,
    decode_tokens_np,
    encode_actions,
    encode_actions_np,
)
from .labels import (
    build_tma_target_tokens,
    change_target,
    extract_action_tokens,
    gripper_open_rows,
    mask_labels,
    maskidx_to_onehot,
    overwrite_with_target,
)
from .normalization import (
    denormalize_image,
    dual_normalize,
    dual_normalize_from_nchw6,
    normalize_actions_q99,
    normalize_image,
    unnormalize_actions_q99,
)
from .prompting import (
    HFTokenizerAdapter,
    PurePromptBuilder,
    WordStubTokenizer,
    build_vla_example,
    pad_batch,
    vla_prompt,
)
from .gripper import invert_gripper_action, normalize_gripper_action
