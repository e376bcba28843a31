from lshm_tpu.utils.rgb import channel_to_rgb, save_image_grid
from lshm_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint, latest_step
from lshm_tpu.utils.metrics import MetricLogger

__all__ = [
    "channel_to_rgb",
    "save_image_grid",
    "save_checkpoint",
    "restore_checkpoint",
    "latest_step",
    "MetricLogger",
]
