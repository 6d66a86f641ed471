from cartographer_tpu.transform import rigid2, rigid3
from cartographer_tpu.transform.interpolation import (
    TimestampedTransform,
    TransformInterpolationBuffer,
    interpolate_timed,
)
