from .dataset import DIAMSDataset, PairBatches
from .pipeline import prefetch_iterator

__all__ = ["DIAMSDataset", "PairBatches", "prefetch_iterator"]
