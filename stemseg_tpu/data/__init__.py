from stemseg_tpu.data.parsers import (  # noqa: F401
    GenericImageSample,
    GenericVideoSequence,
    parse_generic_image_dataset,
    parse_generic_video_dataset,
)
from stemseg_tpu.data.video_dataset import VideoDataset  # noqa: F401
from stemseg_tpu.data.video_loaders import (  # noqa: F401
    DavisDataLoader,
    MOTSDataLoader,
    YoutubeVISDataLoader,
)
from stemseg_tpu.data.image_clip_loaders import (  # noqa: F401
    CocoDataLoader,
    MapillaryDataLoader,
    PascalVOCDataLoader,
)
from stemseg_tpu.data.concat_dataset import ConcatDataset, SparseDataset  # noqa: F401
from stemseg_tpu.data.samplers import (  # noqa: F401
    BatchSampler,
    IterationBasedBatchSampler,
    ShardedSampler,
)
from stemseg_tpu.data.collate import collate_fn  # noqa: F401
from stemseg_tpu.data.inference_loader import (  # noqa: F401
    load_sequence_frames,
    preprocess_frame,
)
from stemseg_tpu.data.augmenter import ImageToSeqAugmenter  # noqa: F401
from stemseg_tpu.data.instance_duplicator import InstanceDuplicator  # noqa: F401
