from stemseg_tpu.inference.windows import get_subsequence_frames  # noqa: F401
from stemseg_tpu.inference.clustering import ClusterParams, cluster_window  # noqa: F401
from stemseg_tpu.inference.chainer import OnlineChainer  # noqa: F401
