"""tpu-qmpc: a TPU-native convex-MPC / QP force-control engine for the Unitree A1.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the C++/ROS
reference controller ``ShuoYangRobotics/A1-QP-MPC-Controller`` (see SURVEY.md):

- 13-state single-rigid-body convex MPC (horizon 10) for ground-reaction forces
- 500 Hz QP balance controller (12 vars, friction pyramid)
- Raibert-heuristic + degree-4 Bezier swing-leg planner
- 18-state / 28-measurement proprioceptive Kalman filter
- gait phase machine, terrain adaptation, torque mapping
- an in-framework SRB plant + terrain simulator to close the loop
  (the reference relies on Gazebo)

Two execution profiles over one pure-functional core:

1. single-scenario low-latency path (matches the reference's 400/500 Hz loops)
2. batched pod path: thousands of domain-randomized scenarios vmapped and
   sharded over a TPU mesh (``jax.sharding`` + ``shard_map``)
"""

from a1_qp_mpc_controller_tpu import config as config
from a1_qp_mpc_controller_tpu import types as types

__version__ = "0.1.0"
