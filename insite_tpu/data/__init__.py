from insite_tpu.data.dataset import SeqDataset
from insite_tpu.data.collection import (
    DatasetCollection,
    PkpdDatasetCollection,
    CancerDatasetCollection,
    ContinuousDatasetCollection,
    make_collection,
)
