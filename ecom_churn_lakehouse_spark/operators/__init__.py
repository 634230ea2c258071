from .asof import asof_join
from .range_join import interval_join
from .sessionize import sessionize
from .windows import dedup_top1, latest_per_key, topk_per_group

__all__ = [
    "asof_join",
    "interval_join",
    "sessionize",
    "dedup_top1",
    "latest_per_key",
    "topk_per_group",
]
