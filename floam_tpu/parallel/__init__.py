"""Multi-device scale-out: sequence-batched odometry over a device mesh and
distributed windowed bundle adjustment via psum-reduced normal equations.

The reference's only parallelism is 3 OS processes chained over ROS TCPROS
topics plus per-node worker threads (SURVEY.md section 2, parallelism
inventory). The TPU-native equivalents here are:
  * data parallelism over independent sequences (``batch``): `shard_map`
    over a ("dp",) mesh axis, one odometry state per sequence;
  * distributed windowed BA (``windowed_ba``): feature factors sharded over
    devices, 6K x 6K normal equations reduced with `psum` over ICI, solved
    replicated — the collective-based replacement for a Ceres back-end.
"""
from .batch import batched_odom_step, make_sharded_odom_step
from .windowed_ba import BAProblem, ba_refine, make_sharded_ba_step
