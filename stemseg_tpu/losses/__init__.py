from stemseg_tpu.losses.lovasz import lovasz_hinge  # noqa: F401
from stemseg_tpu.losses.embedding import EmbeddingLossParams, embedding_loss  # noqa: F401
from stemseg_tpu.losses.semseg import semseg_cross_entropy, foreground_bce  # noqa: F401
