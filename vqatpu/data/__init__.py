from vqatpu.data.batching import (BatchLoader, PrefetchLoader,
                                  make_eval_loader, stack_samples)
from vqatpu.data.dictionary import Dictionary
from vqatpu.data.datasets import (
    ConcatDataset,
    TDIUCFeatureDataset,
    VisualGenomeFeatureDataset,
    VQAFeatureDataset,
)
from vqatpu.data.features import FeatureStore
from vqatpu.data.mc_dataset import V7WDataset, expand_mc_batch

__all__ = [
    "BatchLoader", "ConcatDataset", "Dictionary", "FeatureStore",
    "PrefetchLoader", "make_eval_loader",
    "TDIUCFeatureDataset", "V7WDataset", "VQAFeatureDataset",
    "VisualGenomeFeatureDataset", "expand_mc_batch", "stack_samples",
]
