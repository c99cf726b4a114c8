from stemseg_tpu.utils.constants import LossConsts, ModelOutputConsts, RepoPaths
from stemseg_tpu.utils.registry import Registry
from stemseg_tpu.utils.timer import Timer

__all__ = ["LossConsts", "ModelOutputConsts", "RepoPaths", "Registry", "Timer"]
