from .trajectory import (
    SimFeatures,
    SimImu,
    SimTrajectory,
    make_circle_trajectory,
    make_landmarks,
    project_tracks,
    synthesize_imu,
)
