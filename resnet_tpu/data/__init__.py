from .metadata import ClassMetadata, load_class_metadata
from .jpeg import JpegDataset
from .prefetch import DevicePrefetcher, prefetch_to_device
from .shards import ShardCursor, ShardDataset, ShardIterator, write_shard
from .synthetic import SyntheticDataset

__all__ = [
    "ClassMetadata",
    "load_class_metadata",
    "ShardCursor",
    "ShardDataset",
    "ShardIterator",
    "write_shard",
    "SyntheticDataset",
    "JpegDataset",
    "DevicePrefetcher",
    "prefetch_to_device",
]
