from disn_tpu.data.listing import ListInfo, load_split, cat_counts  # noqa: F401
from disn_tpu.data.pipeline import (  # noqa: F401
    SdfImageDataset, EpochSampler, PrefetchLoader, make_loader,
)
