from stemseg_tpu.inference.output_utils.common import (  # noqa: F401
    annotate_instance,
    masks_to_original_dims,
    select_instances_to_keep,
)
from stemseg_tpu.inference.output_utils.davis import DavisOutputGenerator  # noqa: F401
from stemseg_tpu.inference.output_utils.youtube_vis import YoutubeVISOutputGenerator  # noqa: F401
from stemseg_tpu.inference.output_utils.kitti_mots import KittiMOTSOutputGenerator  # noqa: F401
