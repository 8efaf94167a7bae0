"""Configuration for the TPU-native A1 convex-MPC / QP controller.

Mirrors the reference's three config tiers (see SURVEY.md §5 "Config system"):

1. compile-time constants (``A1Params.h``)  -> module-level Python constants +
   the static, hashable :class:`A1Config` (anything that affects traced shapes
   or control flow under ``jit``),
2. hard-coded defaults (``A1CtrlStates.h:20-133`` ``reset()``)  -> the
   :func:`default_robot_params` pytree,
3. per-platform YAML overrides (``config/*.yaml`` x 6, loaded via
   ``launch/a1_ctrl.launch``)  -> :func:`load_profile` with the six profiles
   ``{gazebo,hardware,isaac}_{qp,mpc}`` transcribed below.

Unlike the reference, physical/gain parameters live in a *traced* pytree
(:class:`RobotParams`) so that domain randomization can vmap over them: every
scenario in a batch may carry its own mass / inertia / friction / gains.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
from flax import struct

# ---------------------------------------------------------------------------
# Compile-time constants (reference: A1Params.h)
# ---------------------------------------------------------------------------

NUM_LEG = 4
NUM_DOF_PER_LEG = 3
NUM_DOF = 12
DIM_GRF = 12

PLAN_HORIZON = 10
MPC_STATE_DIM = 13
MPC_CONSTRAINT_DIM = 20  # 5 rows per leg (4 pyramid + 1 fz bound)

GRF_UPDATE_PERIOD_S = 0.0025       # A1Params.h:10 (2.5 ms -> 400 Hz)
MAIN_UPDATE_PERIOD_S = 0.0025      # A1Params.h:11
HARDWARE_FEEDBACK_PERIOD_S = 0.002  # A1Params.h:12 (500 Hz sensor/EKF loop)

FOOT_FORCE_LOW = 30.0   # N, early-contact threshold (A1Params.h:38)
FOOT_FORCE_HIGH = 80.0

FOOT_SWING_CLEARANCE1 = 0.0   # A1Params.h:41
FOOT_SWING_CLEARANCE2 = 0.4   # A1Params.h:42

FOOT_DELTA_X_LIMIT = 0.1  # Raibert foothold clamp (A1Params.h:44-45)
FOOT_DELTA_Y_LIMIT = 0.1

# joystick command clamps (A1Params.h:16-23)
JOY_CMD_BODY_HEIGHT_MAX = 0.32
JOY_CMD_BODY_HEIGHT_MIN = 0.1
JOY_CMD_BODY_HEIGHT_VEL = 0.04
JOY_CMD_VELX_MAX = 0.6
JOY_CMD_VELY_MAX = 0.3
JOY_CMD_YAW_MAX = 0.8
JOY_CMD_PITCH_MAX = 0.4
JOY_CMD_ROLL_MAX = 0.4

GRAVITY = 9.8  # the MPC's gravity constant state (A1RobotControl.cpp:456)

# moving-window filter sizes (GazeboA1ROS.cpp:100-109, A1RobotControl.cpp:52-57)
IMU_FILTER_WINDOW = 5
RECENT_CONTACT_FILTER_WINDOW = 60
TERRAIN_FILTER_WINDOW = 100

# leg geometry (GazeboA1ROS.cpp:72-98); leg order FL, FR, RL, RR
LEG_OFFSET_X = (0.1805, 0.1805, -0.1805, -0.1805)
LEG_OFFSET_Y = (0.047, -0.047, 0.047, -0.047)
MOTOR_OFFSET = (0.0838, -0.0838, 0.0838, -0.0838)
UPPER_LEG_LENGTH = 0.21
LOWER_LEG_LENGTH = 0.21


# ---------------------------------------------------------------------------
# Static config: affects traced shapes / python-level control flow
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class A1Config:
    """Static (hashable) configuration.

    Everything here is baked into the jitted computation: changing a field
    triggers recompilation. Per-scenario physical values belong in
    :class:`RobotParams` instead.
    """

    horizon: int = PLAN_HORIZON
    state_dim: int = MPC_STATE_DIM
    # 0: QP balance controller, 1: convex MPC (A1CtrlStates.h:329)
    stance_leg_control_type: int = 1
    use_terrain_adapt: bool = True
    # True mirrors rosparam use_sim_time: MPC integrates with measured dt in
    # sim, fixed 2.5 ms on hardware (A1RobotControl.cpp:458-467)
    use_sim_time: bool = True
    control_dt: float = MAIN_UPDATE_PERIOD_S
    # gait phase machine (A1CtrlStates.h:24-25)
    counter_per_gait: float = 240.0
    counter_per_swing: float = 120.0
    # EKF measurement model: flat-ground foot-height rows enabled
    assume_flat_ground: bool = True
    # False = ground-truth root feed (the Isaac adapter's gt-pose mode,
    # IsaacA1ROS.cpp:189; used for pure-controller trajectory validation)
    use_estimator: bool = True
    # ADMM solver iteration budgets (see ops/qp.py)
    mpc_qp_iters: int = 100
    stand_qp_iters: int = 100
    qp_check_every: int = 25
    # fixed mode only: when > 0, an unconverged solve gets this many
    # EXTRA warm-started iterations (single-scenario: a lax.cond second
    # pass; batched executors implement the same contract with a
    # gathered rescue pass, parallel.batched rescue_capacity). Flip
    # ticks are where a fixed budget falls short; the rescue closes
    # them without paying on calm ticks.
    mpc_rescue_iters: int = 0
    # fixed mode only: deterministic round-robin accuracy polish. Every
    # ``mpc_polish_every`` ticks a solve gets ``mpc_polish_iters`` EXTRA
    # warm-started iterations at its carried stepsize (no refactor).
    # Round-5 finding (scripts/probe_golden_tail.py): the golden-gate
    # tail of the fixed schedule is warm-start drift in the near-flat
    # internal-force directions 7-40 ticks AFTER flips — invisible to
    # the OSQP residual checks (ok-tick residuals overlap offender
    # residuals completely), so no residual trigger can catch it; a
    # deterministic polish cadence bounds the drift window instead.
    # Batched executors implement the same contract with a gathered
    # top-k pass staggered by scenario index (parallel.batched).
    # 0 disables (default); bench/golden configs enable it.
    mpc_polish_every: int = 0
    mpc_polish_iters: int = 0
    # fixed mode only: linear warm-start extrapolation gain. The MPC
    # optimum drifts smoothly between contact flips (foot positions and
    # yaw move mm/mrad per tick), but its component along the NEAR-FLAT
    # internal-force directions (r_weights ~1e-7) moves several N per
    # tick — too fast for a 25-iteration budget to track from last
    # tick's solution (the golden-tail drift, probe_golden_tail.py).
    # Warm-starting from x + gain*(x - x_prev) predicts the moving
    # optimum to first order at ZERO solve cost; the stored delta is
    # reset at flips (where the cold/rescaled flip policy applies
    # instead). 0 disables (default).
    mpc_warm_extrapolate: float = 0.0
    # fixed mode only: post-flip rescue window shape. The first 4 ticks
    # after a flip are rescued EVERY tick (the round-4 cooldown); ticks
    # 5..mpc_cooldown_ticks are rescued every mpc_cooldown_stride-th
    # tick (staggered by the tick counter). Round-5 finding
    # (probe_golden_tail.py): every golden-gate offender of the fixed
    # schedule sits 7-40 ticks post-flip — warm-start drift in the
    # near-flat force directions with NO residual signature, fixed only
    # by 150-iteration continuations; a strided cadence buys them at
    # bounded rescue load. Defaults preserve the round-4 window.
    mpc_cooldown_ticks: int = 4
    mpc_cooldown_stride: int = 1
    # width of the EVERY-TICK head of the window (ticks 1..dense after
    # a flip); the full-10s probe showed residual offenders at exactly
    # since_flip 7 (steep early drift between the 4-tick dense head and
    # the first strided slot) — 8 closes them
    mpc_cooldown_dense: int = 4
    # fixed mode only: drift-predictive rescue trigger (N). When the
    # last inter-tick first-step force delta exceeds this, the scenario
    # is rescue-flagged on the NEXT tick: the golden-tail episodes are
    # windows where the optimum slews ~0.5-1 N/tick in the near-flat
    # directions — the slew itself is the only observable signature
    # (solver residuals carry none), and it is already maintained in
    # mem.mpc_warm_dx for the extrapolation experiment. 0 disables.
    mpc_drift_rescue_n: float = 0.0
    # 'adaptive': early-exit while_loop with in-solve rho adaptation (lowest
    # latency single-scenario). 'fixed': lock-step fixed-iteration solve
    # with cross-tick warm-start + rho carry (batched throughput path).
    mpc_solver_mode: str = "adaptive"
    # Advance the horizon's foot positions with the commanded velocity
    # (per-step B matrices). The reference's production path reuses one B
    # for all steps (A1RobotControl.cpp:498-514) while its test harness
    # uses receding footholds (test_mpc.cpp:106-122) and the production
    # version is left commented out (A1RobotControl.cpp:504-507); default
    # False preserves production parity.
    mpc_receding_footholds: bool = False
    # number of warm-up ticks emitting zero torque (A1RobotControl.cpp:292-295)
    torque_warmup_ticks: int = 10
    # hardware command safety (Safety::PositionLimit / PowerProtect analogs,
    # HardwareA1ROS.cpp:194-197); power_level 1-10 as in the Unitree SDK
    apply_safety: bool = False
    power_level: int = 5

    @property
    def n_mpc_vars(self) -> int:
        return NUM_DOF * self.horizon

    @property
    def n_mpc_constraints(self) -> int:
        return MPC_CONSTRAINT_DIM * self.horizon


# ---------------------------------------------------------------------------
# Robot parameters: traced pytree, vmappable for domain randomization
# ---------------------------------------------------------------------------


class RobotParams(struct.PyTreeNode):
    """Physical constants + controller gains (one scenario's worth).

    Layout conventions: all per-foot arrays are ``(4, 3)`` = (leg, xyz) with
    leg order FL, FR, RL, RR (the reference stores these transposed ``(3,4)``).
    """

    robot_mass: jnp.ndarray          # () kg
    trunk_inertia: jnp.ndarray       # (3,3) body-frame inertia
    default_foot_pos: jnp.ndarray    # (4,3) neutral foothold, body frame

    # MPC weights (A1CtrlStates q_weights/r_weights)
    q_weights: jnp.ndarray           # (13,)
    r_weights: jnp.ndarray           # (12,)
    mu_mpc: jnp.ndarray              # () friction coeff in MPC cone (0.3)
    fz_min: jnp.ndarray              # () per-foot normal force lower bound
    fz_max: jnp.ndarray              # () per-foot normal force upper bound

    # stand-QP weights (A1RobotControl ctor: Q diag 6, scalar R, mu=0.7)
    qp_q_weights: jnp.ndarray        # (6,)
    qp_r_weight: jnp.ndarray         # ()
    mu_qp: jnp.ndarray               # ()

    # swing-leg PD + torque mapping gains
    kp_foot: jnp.ndarray             # (4,3)
    kd_foot: jnp.ndarray             # (4,3)
    km_foot: jnp.ndarray             # (3,)

    # root PD gains (QP path + desired-state shaping)
    kp_linear: jnp.ndarray           # (3,)
    kd_linear: jnp.ndarray           # (3,)
    kp_angular: jnp.ndarray          # (3,)
    kd_angular: jnp.ndarray          # (3,)
    kp_linear_lock_xy: jnp.ndarray   # (2,) position-lock gains

    gait_counter_speed: jnp.ndarray  # (4,) phase increments per tick
    torques_gravity: jnp.ndarray     # (12,) feed-forward hip torques

    # per-leg kinematic parameters: rho_fix (4,5), rho_opt (4,3)
    rho_fix: jnp.ndarray
    rho_opt: jnp.ndarray

    # plant-side ground friction coefficient (NOT a controller gain —
    # the physical mu of the simulated terrain; the reference validated
    # against Gazebo's friction-capable ODE contacts, README.md:154-187).
    # Default 0.8 > any controller cone mu, so nominal scenarios do not
    # slip; lower it per scenario to exercise the friction cones.
    mu_ground: jnp.ndarray           # ()


def _leg_rho_fix() -> jnp.ndarray:
    rows = []
    for i in range(NUM_LEG):
        rows.append([LEG_OFFSET_X[i], LEG_OFFSET_Y[i], MOTOR_OFFSET[i],
                     UPPER_LEG_LENGTH, LOWER_LEG_LENGTH])
    return jnp.array(rows, dtype=jnp.float32)


def default_robot_params(dtype=jnp.float32) -> RobotParams:
    """Hard-coded defaults mirroring ``A1CtrlStates::reset``
    (A1CtrlStates.h:20-133)."""
    f = lambda x: jnp.asarray(x, dtype=dtype)
    return RobotParams(
        robot_mass=f(15.0),
        trunk_inertia=f(jnp.diag(jnp.array([0.0158533, 0.0377999, 0.0456542]))),
        default_foot_pos=f([[0.17, 0.15, -0.35],
                            [0.17, -0.15, -0.35],
                            [-0.17, 0.15, -0.35],
                            [-0.17, -0.15, -0.35]]),
        q_weights=f([80.0, 80.0, 1.0, 0.0, 0.0, 270.0,
                     1.0, 1.0, 20.0, 20.0, 20.0, 20.0, 0.0]),
        r_weights=f([1e-5, 1e-5, 1e-6] * 4),
        mu_mpc=f(0.3),
        fz_min=f(0.0),
        fz_max=f(180.0),
        qp_q_weights=f([1.0, 1.0, 1.0, 400.0, 400.0, 100.0]),
        qp_r_weight=f(1e-3),
        mu_qp=f(0.7),
        kp_foot=f([[300.0, 400.0, 400.0]] * 4),
        kd_foot=f([[8.0, 8.0, 8.0]] * 4),
        km_foot=f([0.1, 0.1, 0.1]),
        kp_linear=f([1000.0, 1000.0, 1000.0]),
        kd_linear=f([200.0, 70.0, 120.0]),
        kp_angular=f([650.0, 35.0, 1.0]),
        kd_angular=f([4.5, 4.5, 30.0]),
        kp_linear_lock_xy=f([1000.0, 1000.0]),
        gait_counter_speed=f([2.0, 2.0, 2.0, 2.0]),
        torques_gravity=f([0.80, 0, 0, -0.80, 0, 0, 0.80, 0, 0, -0.80, 0, 0]),
        rho_fix=_leg_rho_fix().astype(dtype),
        rho_opt=jnp.zeros((NUM_LEG, 3), dtype=dtype),
        mu_ground=f(0.8),
    )


# ---------------------------------------------------------------------------
# The six platform profiles (reference config/*.yaml + rosparam defaults from
# A1CtrlStates::resetFromROSParam, A1CtrlStates.h:135-320)
# ---------------------------------------------------------------------------

# values a YAML does not set fall back to the resetFromROSParam defaults:
_ROSPARAM_DEFAULTS = dict(
    robot_mass=13.0,
    trunk_inertia=(0.0158533, 0.0377999, 0.0456542),
    default_foot_pos=((0.25, 0.15, -0.33), (0.25, -0.15, -0.33),
                      (-0.17, 0.15, -0.33), (-0.17, -0.15, -0.33)),
    q_weights=(80.0, 80.0, 1.0, 0.0, 0.0, 270.0,
               1.0, 1.0, 20.0, 20.0, 20.0, 20.0, 0.0),
    r_weights=(1e-5, 1e-5, 1e-6) * 4,
    kp_foot=(150.0, 150.0, 200.0),
    kd_foot=(0.0, 0.0, 0.0),
    km_foot=(0.1, 0.1, 0.04),
    kp_linear=(120.0, 120.0, 500.0),
    kd_linear=(70.0, 70.0, 120.0),
    kp_angular=(250.0, 35.0, 1.0),
    kd_angular=(1.5, 1.5, 30.0),
    gait_counter_speed=(2.0, 2.0, 2.0, 2.0),
)

_PROFILES = {
    # config/gazebo_a1_mpc.yaml
    "gazebo_mpc": dict(
        control_type=1, use_sim_time=True, use_terrain_adapt=True,
        robot_mass=12.0,
        default_foot_pos=((0.17, 0.15, -0.35), (0.17, -0.15, -0.35),
                          (-0.17, 0.15, -0.35), (-0.17, -0.15, -0.35)),
        gait_counter_speed=(1.5,) * 4,
        q_weights=(20.0, 10.0, 1.0, 0.0, 0.0, 420.0,
                   0.05, 0.05, 0.05, 30.0, 30.0, 10.0, 0.0),
        r_weights=(1e-7,) * 12,
        kp_foot=(200.0, 200.0, 150.0), kd_foot=(10.0, 10.0, 5.0),
        km_foot=(0.1, 0.1, 0.1),
    ),
    # config/gazebo_a1_qp.yaml
    "gazebo_qp": dict(
        control_type=0, use_sim_time=True, use_terrain_adapt=True,
        robot_mass=12.0,
        default_foot_pos=((0.17, 0.15, -0.35), (0.17, -0.15, -0.35),
                          (-0.17, 0.15, -0.35), (-0.17, -0.15, -0.35)),
        gait_counter_speed=(2.0,) * 4,
        kp_foot=(300.0, 400.0, 400.0), kd_foot=(8.0, 8.0, 8.0),
        km_foot=(0.1, 0.1, 0.1),
        kp_linear=(100.0, 100.0, 300.0), kd_linear=(70.0, 70.0, 120.0),
        kp_angular=(150.0, 150.0, 1.0), kd_angular=(4.5, 4.5, 30.0),
    ),
    # config/hardware_a1_mpc.yaml
    "hardware_mpc": dict(
        control_type=1, use_sim_time=False, use_terrain_adapt=True,
        power_level=10,
        robot_mass=13.5,
        trunk_inertia=(0.0178533, 0.0377999, 0.0456542),
        default_foot_pos=((0.17, 0.15, -0.3), (0.17, -0.15, -0.3),
                          (-0.17, 0.15, -0.3), (-0.17, -0.15, -0.3)),
        gait_counter_speed=(1.4,) * 4,
        q_weights=(150.0, 150.0, 50.0, 0.0, 0.0, 80.0,
                   0.2, 0.2, 0.2, 0.3, 0.3, 0.3, 0.0),
        r_weights=(1e-2, 1e-2, 1e-3) * 4,
        kp_foot=(120.0, 120.0, 80.0), kd_foot=(6.0, 6.0, 5.0),
        km_foot=(0.1, 0.1, 0.1),
    ),
    # config/hardware_a1_qp.yaml
    "hardware_qp": dict(
        control_type=0, use_sim_time=False, use_terrain_adapt=True,
        power_level=8,
        robot_mass=15.0,
        gait_counter_speed=(1.0,) * 4,
        kp_foot=(260.0, 260.0, 350.0), kd_foot=(6.0, 6.0, 5.0),
        km_foot=(0.1, 0.1, 0.1),
        kp_linear=(400.0, 400.0, 1500.0), kd_linear=(300.0, 200.0, 120.0),
        kp_angular=(40.0, 40.0, 10.0), kd_angular=(1.0, 1.0, 0.5),
    ),
    # config/isaac_a1_mpc.yaml (note use_terrain_adapt: 0)
    "isaac_mpc": dict(
        control_type=1, use_sim_time=True, use_terrain_adapt=False,
        robot_mass=12.0,
        default_foot_pos=((0.24, 0.15, -0.35), (0.24, -0.15, -0.35),
                          (-0.17, 0.15, -0.35), (-0.17, -0.15, -0.35)),
        gait_counter_speed=(2.5,) * 4,
        q_weights=(100.0, 100.0, 50.0, 0.0, 0.0, 420.0,
                   0.01, 0.01, 0.05, 30.0, 30.0, 10.0, 0.0),
        r_weights=(1e-7,) * 12,
        kp_foot=(3250.0, 3250.0, 4000.0), kd_foot=(5.0, 5.0, 5.0),
        km_foot=(0.5, 0.5, 0.5),
    ),
    # config/isaac_a1_qp.yaml
    "isaac_qp": dict(
        control_type=0, use_sim_time=True, use_terrain_adapt=True,
        robot_mass=12.0,
        gait_counter_speed=(2.0,) * 4,
        kp_foot=(4250.0, 4250.0, 3000.0), kd_foot=(0.0, 0.0, 0.0),
        km_foot=(0.5, 0.5, 0.5),
        kp_linear=(1450.0, 1450.0, 3800.0), kd_linear=(2600.0, 2600.0, 0.0),
        kp_angular=(420.0, 420.0, 150.0), kd_angular=(0.0, 0.0, 560.0),
    ),
}

PROFILE_NAMES: Tuple[str, ...] = tuple(sorted(_PROFILES))


def load_profile(name: str, dtype=jnp.float32) -> Tuple[A1Config, RobotParams]:
    """Build (static config, robot params) for one of the six reference
    profiles: ``gazebo_mpc``, ``gazebo_qp``, ``hardware_mpc``, ``hardware_qp``,
    ``isaac_mpc``, ``isaac_qp``."""
    if name not in _PROFILES:
        raise KeyError(f"unknown profile {name!r}; choose from {PROFILE_NAMES}")
    p = dict(_ROSPARAM_DEFAULTS)
    p.update(_PROFILES[name])
    f = lambda x: jnp.asarray(x, dtype=dtype)
    cfg = A1Config(
        stance_leg_control_type=p["control_type"],
        use_terrain_adapt=p["use_terrain_adapt"],
        use_sim_time=p["use_sim_time"],
        apply_safety=not p["use_sim_time"],
        power_level=p.get("power_level", 5),
    )
    ixx, iyy, izz = p["trunk_inertia"]
    params = default_robot_params(dtype).replace(
        robot_mass=f(p["robot_mass"]),
        trunk_inertia=f(jnp.diag(jnp.array([ixx, iyy, izz]))),
        default_foot_pos=f(p["default_foot_pos"]),
        q_weights=f(p["q_weights"]),
        r_weights=f(p["r_weights"]),
        kp_foot=f([p["kp_foot"]] * NUM_LEG),
        kd_foot=f([p["kd_foot"]] * NUM_LEG),
        km_foot=f(p["km_foot"]),
        kp_linear=f(p["kp_linear"]),
        kd_linear=f(p["kd_linear"]),
        kp_angular=f(p["kp_angular"]),
        kd_angular=f(p["kd_angular"]),
        kp_linear_lock_xy=f(p["kp_linear"][:2]),
        gait_counter_speed=f(p["gait_counter_speed"]),
    )
    return cfg, params
