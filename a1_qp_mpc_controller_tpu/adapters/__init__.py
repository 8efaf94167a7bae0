"""Platform adapters: Gazebo, Hardware (Unitree SDK wire), Isaac.

The functional re-design of the reference's three adapter classes
(GazeboA1ROS / HardwareA1ROS / IsaacA1ROS, SURVEY.md §2 rows 10-12).
Each adapter is a pair of pure functions around the platform's native
message shapes:

    ingest:  platform raw state  -> SensorData (controller order/frames)
    egress:  joint torques (+cs) -> platform command struct

plus the shared joystick semantics (`adapters.joystick`): raw axes /
buttons -> JoyCmd with the reference's toggle-on-A / latch-on-LB logic.

The control core itself is platform-agnostic — adapters only reorder,
filter, and format. All ingest/egress functions are jittable and
vmappable (batched sim farms can run a *platform-faithful* sensor path).
"""

from a1_qp_mpc_controller_tpu.adapters import (  # noqa: F401
    gazebo, hardware, isaac, joystick,
)
