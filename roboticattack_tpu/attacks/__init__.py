from .engine import (
    AttackBatch,
    AttackSpec,
    AttackState,
    init_attack_state,
    make_attack_step,
    make_val_step,
)
from .losses import (
    clip_grad_l1,
    gripper_asr_counts,
    per_dim_relative_distance,
    relative_distance_target,
    tma_metrics,
    uada_loss,
    upa_loss,
)
from .artifacts import (
    load_patch,
    plot_loss_curve,
    save_checkpoint,
    save_history_pickles,
    save_patch_pt,
)
from .attacker import AttackConfig, AttackResult, OpenVLAAttacker, filter_gripper_open
from .optimizer import (
    AdamState,
    adam_init,
    adamw_update,
    cosine_schedule_with_warmup,
    pgd_update,
)
