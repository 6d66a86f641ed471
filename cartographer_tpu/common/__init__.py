from cartographer_tpu.common.time import Time, Duration, from_seconds, to_seconds
from cartographer_tpu.common.math import (
    clamp,
    normalize_angle_difference,
    round_to_int,
)
from cartographer_tpu.common.fixed_ratio_sampler import FixedRatioSampler
from cartographer_tpu.common.histogram import Histogram
from cartographer_tpu.common.task import Task, ThreadPool
from cartographer_tpu.common.blocking_queue import BlockingQueue
