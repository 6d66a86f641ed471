from cartographer_tpu.sensor.data import (
    FixedFramePoseData,
    ImuData,
    LandmarkData,
    LandmarkObservation,
    OdometryData,
    PointCloud,
    RangeData,
    TimedPointCloudData,
    TimedPointCloudOriginData,
)
from cartographer_tpu.sensor.voxel_filter import (
    adaptive_voxel_filter,
    filter_by_max_range,
    voxel_filter,
)
