from .configs import (
    DescriptorConfig,
    PoolRegionConfig,
    PRLearnConfig,
    PJLearnConfig,
)
from .progress import TermProgress
from .logs import MetricLogger

__all__ = [
    "DescriptorConfig",
    "PoolRegionConfig",
    "PRLearnConfig",
    "PJLearnConfig",
    "TermProgress",
    "MetricLogger",
]
