from .policy import VLAPolicy, load_policy
from .processing import (
    center_crop_resize_tf,
    eval_prompt,
    libero_frame,
    resize_bicubic_pil,
)
from .queue import SUITE_PLACEMENTS, organize_experiments, run_queue
