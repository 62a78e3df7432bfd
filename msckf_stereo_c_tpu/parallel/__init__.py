from .multiseq import (
    batched_gravity_init,
    batched_init_state,
    make_mesh,
    make_sharded_runner,
    run_multi_sequence,
)
from .ba import BAProblem, ba_gauss_newton, make_distributed_ba, problem_from_vio
from .posegraph import (
    PoseGraph,
    make_distributed_pose_graph,
    odometry_edges,
    optimize_pose_graph,
)
