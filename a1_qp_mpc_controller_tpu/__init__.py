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

import os as _os

import jax as _jax

# On TPU, JAX's DEFAULT f32 matmul precision feeds the MXU bf16 inputs —
# ~3 decimal digits of silent error in every rotation/Jacobian/cost
# product that doesn't explicitly request HIGHEST. For a controller whose
# headline guarantee is trajectory-level agreement with a float64
# reference (runtime/golden.py), that default is wrong: force f32-exact
# matmuls package-wide (the solver hot spots already request HIGHEST
# per-op; Pallas kernels set their own). Opt out (e.g. for throughput
# experiments) with A1QPMPC_DEFAULT_MATMUL_PRECISION=default.
_prec = _os.environ.get("A1QPMPC_DEFAULT_MATMUL_PRECISION", "highest")
if _prec != "default":
    _jax.config.update("jax_default_matmul_precision", _prec)

from a1_qp_mpc_controller_tpu import config as config  # noqa: E402
from a1_qp_mpc_controller_tpu import types as types  # noqa: E402

__version__ = "0.1.0"
