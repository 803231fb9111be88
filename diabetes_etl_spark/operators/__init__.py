from .asof import asof_join
from .topk import topk_per_group

__all__ = ["asof_join", "topk_per_group"]
