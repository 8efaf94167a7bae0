"""Single-rigid-body MPC model: continuous dynamics, discretization, and the
condensed horizon QP construction.

Re-designed from the reference's ``ConvexMpc`` (ConvexMpc.cpp:110-260) for
TPU/XLA:

- The continuous A matrix is nilpotent-plus-structure: ``A_c`` has only the
  omega->rpy-rate block (yaw-only, ConvexMpc.cpp:123-129), the velocity->
  position identity, and the gravity channel ``A_c[11,12]=1``. Because
  ``A_c^3 = 0`` exactly, the forward-Euler discrete powers have the closed
  form ``A_d^k = I + k*dt*A_c + C(k,2)*dt^2*A_c^2`` — the ~0.2 ms the
  reference spends on the sequential A_qp/B_qp power stack
  (ConvexMpc.cpp:180-202) collapses into a few fused broadcasts.
- B_qp is block-Toeplitz in ``M_k = A_d^k B_d`` (when B is held constant over
  the horizon, as the production path does — A1RobotControl.cpp:498-514); the
  (130x120) matrix is materialized with one masked einsum, and the
  (120x120) hessian ``B' Q B + R`` is a single MXU matmul.
- Everything vmaps over a scenario batch; shapes are static in the horizon.

State layout (13): [roll,pitch,yaw, x,y,z, wx,wy,wz, vx,vy,vz, g] with the
gravity constant as the 13th state (value -9.8, A1RobotControl.cpp:456).
Decision variables (12 per step): world-frame ground-reaction forces, 3 per
leg, legs ordered FL,FR,RL,RR.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from a1_qp_mpc_controller_tpu.config import (
    MPC_STATE_DIM, NUM_DOF, NUM_LEG, PLAN_HORIZON,
)
from a1_qp_mpc_controller_tpu.utils import mathx
from a1_qp_mpc_controller_tpu.utils.mathx import skew

_HIGH = jax.lax.Precision.HIGHEST


def continuous_a(root_euler: jnp.ndarray) -> jnp.ndarray:
    """A_c (13,13). Parity: ConvexMpc::calculate_A_mat_c
    (ConvexMpc.cpp:110-130) — yaw-only angular-velocity-to-rpy-rate map."""
    dtype = root_euler.dtype
    cy, sy = jnp.cos(root_euler[2]), jnp.sin(root_euler[2])
    a = jnp.zeros((MPC_STATE_DIM, MPC_STATE_DIM), dtype)
    ang_vel_to_rpy = jnp.stack([
        jnp.stack([cy, sy, jnp.zeros((), dtype)]),
        jnp.stack([-sy, cy, jnp.zeros((), dtype)]),
        jnp.array([0.0, 0.0, 1.0], dtype),
    ])
    a = a.at[0:3, 6:9].set(ang_vel_to_rpy)
    a = a.at[3:6, 9:12].set(jnp.eye(3, dtype=dtype))
    a = a.at[11, 12].set(1.0)
    return a


def continuous_b(robot_mass: jnp.ndarray, trunk_inertia: jnp.ndarray,
                 root_rot_mat: jnp.ndarray,
                 foot_pos: jnp.ndarray) -> jnp.ndarray:
    """B_c (13,12). Parity: ConvexMpc::calculate_B_mat_c
    (ConvexMpc.cpp:132-143). ``foot_pos`` is (4,3) world-aligned
    body-centered foot positions."""
    dtype = foot_pos.dtype
    inertia_world = root_rot_mat @ trunk_inertia @ root_rot_mat.T
    inv_inertia = mathx.inv3(inertia_world)
    b = jnp.zeros((MPC_STATE_DIM, NUM_DOF), dtype)
    torque_blocks = jnp.einsum("ab,lbc->lac", inv_inertia, skew(foot_pos),
                               precision=_HIGH)  # (4,3,3)
    force_block = jnp.eye(3, dtype=dtype) / robot_mass
    for i in range(NUM_LEG):
        b = b.at[6:9, 3 * i:3 * i + 3].set(torque_blocks[i])
        b = b.at[9:12, 3 * i:3 * i + 3].set(force_block)
    return b


def discretize(a_c: jnp.ndarray, b_c: jnp.ndarray, dt: jnp.ndarray):
    """Forward-Euler discretization, deliberately matching the reference's
    simplification (not expm): A_d = I + A_c dt, B_d = B_c dt
    (ConvexMpc.cpp:145-156)."""
    a_d = jnp.eye(MPC_STATE_DIM, dtype=a_c.dtype) + a_c * dt
    b_d = b_c * dt
    return a_d, b_d


def a_d_powers(a_c: jnp.ndarray, dt: jnp.ndarray, horizon: int) -> jnp.ndarray:
    """(H+1, 13, 13) stack of A_d^k for k = 0..H, in closed form.

    A_c is nilpotent of index 3 (A_c^2 has the single entry [5,12] coming
    from gravity integrating into z-position), so
    ``(I + dt A_c)^k = I + k dt A_c + k(k-1)/2 dt^2 A_c^2`` exactly.
    """
    dtype = a_c.dtype
    k = jnp.arange(horizon + 1, dtype=dtype)
    a_c2 = jnp.matmul(a_c, a_c, precision=_HIGH)
    eye = jnp.eye(MPC_STATE_DIM, dtype=dtype)
    return (eye[None] + k[:, None, None] * dt * a_c
            + (k * (k - 1.0) / 2.0)[:, None, None] * dt * dt * a_c2)


@partial(jax.jit, static_argnames=("horizon",))
def condense(a_c: jnp.ndarray, b_d_list: jnp.ndarray, dt: jnp.ndarray,
             horizon: int = PLAN_HORIZON):
    """Build A_qp (H*13, 13) and B_qp (H*13, H*12).

    Parity with ConvexMpc::calculate_qp_mats (ConvexMpc.cpp:166-202):
      A_qp row-block i = A_d^(i+1)
      B_qp block (i,j) = A_d^(i-j) B_d[j]  for j <= i, else 0.

    ``b_d_list`` is (H, 13, 12); the production path passes H copies of one
    B_d (same foot positions for the whole horizon), but per-step B matrices
    (as the reference's test_mpc.cpp:106-122 uses) are supported unchanged.
    """
    n, m = MPC_STATE_DIM, NUM_DOF
    powers = a_d_powers(a_c, dt, horizon)          # (H+1, n, n)
    a_qp = powers[1:].reshape(horizon * n, n)      # rows A_d^1 .. A_d^H

    i_idx = jnp.arange(horizon)[:, None]
    j_idx = jnp.arange(horizon)[None, :]
    lag = jnp.clip(i_idx - j_idx, 0, horizon)      # (H, H)
    toeplitz = powers[lag]                         # (H, H, n, n)
    mask = (i_idx >= j_idx).astype(a_c.dtype)[:, :, None, None]
    blocks = jnp.einsum("ijab,jbc->ijac", toeplitz * mask, b_d_list,
                        precision=_HIGH)           # (H, H, n, m)
    b_qp = blocks.transpose(0, 2, 1, 3).reshape(horizon * n, horizon * m)
    return a_qp, b_qp


@partial(jax.jit, static_argnames=("horizon",))
def condense_same_b(a_c: jnp.ndarray, b_d: jnp.ndarray, dt: jnp.ndarray,
                    horizon: int = PLAN_HORIZON):
    """Fast path for the production case where one B_d serves the whole
    horizon (A1RobotControl.cpp:498-514): B_qp is block-Toeplitz in
    ``M_k = A_d^k B_d``, so only the H distinct blocks are computed (H
    small matmuls) and the (H*13, H*12) matrix is a gather — ~10x fewer
    flops than the general per-(i,j) product and far fewer tiny-matmul
    kernels on TPU."""
    n, m = MPC_STATE_DIM, NUM_DOF
    powers = a_d_powers(a_c, dt, horizon)              # (H+1, n, n)
    a_qp = powers[1:].reshape(horizon * n, n)
    m_blocks = jnp.einsum("kab,bc->kac", powers[:horizon], b_d,
                          precision=_HIGH)             # (H, n, m)
    # Toeplitz placement via a STATIC-index gather (m_blocks[lag] with
    # lag a compile-time (H, H) array). Measured A/B on the full closed
    # tick at batch 1024 (scripts/profile_condense_ab.py, v5e): this
    # gather form runs 3.3 ms/tick FASTER than an equivalent
    # static-slice+stack construction — XLA constant-folds the static
    # index gather, while 10 slice+stack ops materialize extra copies.
    # (The pathological-gather warning in CLAUDE.md is about
    # data-dependent batched gathers, not constant-index ones.)
    i_idx = jnp.arange(horizon)[:, None]
    j_idx = jnp.arange(horizon)[None, :]
    lag = jnp.clip(i_idx - j_idx, 0, horizon - 1)
    mask = (i_idx >= j_idx).astype(a_c.dtype)[:, :, None, None]
    blocks = m_blocks[lag] * mask                      # (H, H, n, m)
    b_qp = blocks.transpose(0, 2, 1, 3).reshape(horizon * n, horizon * m)
    return a_qp, b_qp


@partial(jax.jit, static_argnames=("horizon",))
def mpc_cost(a_qp: jnp.ndarray, b_qp: jnp.ndarray, q_weights: jnp.ndarray,
             r_weights: jnp.ndarray, mpc_states: jnp.ndarray,
             mpc_states_d: jnp.ndarray, horizon: int = PLAN_HORIZON,
             contacts: jnp.ndarray | None = None):
    """Condensed QP cost: P = B' Q B + R, q = B' Q (A x0 - x_ref).

    Matches ConvexMpc.cpp:207-217 including the factor-2 convention baked
    into the reference's Q/R diagonals (ConvexMpc.cpp:20,41): Q = 2*diag(q_w
    tiled), R = 2*diag(r_w tiled).

    ``contacts`` (4,) bool, optional: apply swing-variable elimination
    (see :func:`eliminate_swing`) directly in the cost build — masking
    the (H*13, H*12) B_qp COLUMNS before the GEMM instead of masking the
    (H*12)^2 P afterwards saves a full P-sized pass per scenario.
    """
    q_diag = 2.0 * jnp.tile(q_weights, horizon)    # (H*13,)
    r_diag = 2.0 * jnp.tile(r_weights, horizon)    # (H*12,)
    if contacts is not None:
        s_var = jnp.tile(jnp.repeat(contacts, 3), horizon)   # (H*12,)
        sf = s_var.astype(b_qp.dtype)
        b_qp = b_qp * sf[None, :]
        r_diag = r_diag * sf + (1.0 - sf)
    bq = b_qp * q_diag[:, None]                    # Q B (diag scale)
    p_mat = jnp.matmul(b_qp.T, bq, precision=_HIGH)
    p_mat = p_mat + jnp.diag(r_diag)
    resid = a_qp @ mpc_states - mpc_states_d       # (H*13,)
    q_vec = jnp.matmul(bq.T, resid, precision=_HIGH)
    return p_mat, q_vec


def friction_constraint_matrix(mu: jnp.ndarray, horizon: int = PLAN_HORIZON,
                               dtype=jnp.float32) -> jnp.ndarray:
    """(H*20, H*12) MPC constraint matrix: per (step, leg) the 5 rows
    { Fx + mu Fz in [0, inf), Fx - mu Fz in (-inf, 0],
      Fy + mu Fz in [0, inf), Fy - mu Fz in (-inf, 0],
      Fz in [c*fz_min, c*fz_max] }   (ConvexMpc.cpp:46-58, 226-239)."""
    one = jnp.ones((), dtype)
    leg_block = jnp.stack([
        jnp.stack([one, 0 * one, mu]),
        jnp.stack([one, 0 * one, -mu]),
        jnp.stack([0 * one, one, mu]),
        jnp.stack([0 * one, one, -mu]),
        jnp.stack([0 * one, 0 * one, one]),
    ])  # (5,3)
    n_blk = horizon * NUM_LEG
    mat = jnp.zeros((n_blk, 5, n_blk, 3), dtype)
    idx = jnp.arange(n_blk)
    mat = mat.at[idx, :, idx, :].set(jnp.broadcast_to(leg_block,
                                                      (n_blk, 5, 3)))
    return mat.reshape(n_blk * 5, n_blk * 3)


def friction_constraint_basis(horizon: int = PLAN_HORIZON,
                              dtype=jnp.float32):
    """Shared decomposition of the MPC constraint matrix: A(mu) = A0 + mu*A1
    with A0/A1 CONSTANT (no scenario dependence). Lets batched executors
    express every A-product as a scenario-rows x shared-matrix MXU matmul
    and skip materializing the (H*20, H*12) matrix per scenario."""
    return friction_constraint_basis_nblk(horizon * NUM_LEG, dtype)


def friction_constraint_basis_nblk(n_blk: int, dtype=jnp.float32):
    """:func:`friction_constraint_basis` for an arbitrary number of
    (step, leg) blocks — the constraint structure is n_blk identical
    (5, 3) blocks down the diagonal, so a CONTACT-PATTERN-REDUCED system
    (stance blocks gathered in block order) has exactly the same shared
    basis at its reduced block count."""
    base_block, mu_block = friction_basis_blocks(dtype)
    idx = jnp.arange(n_blk)

    def expand(block):
        mat = jnp.zeros((n_blk, 5, n_blk, 3), dtype)
        mat = mat.at[idx, :, idx, :].set(jnp.broadcast_to(block,
                                                          (n_blk, 5, 3)))
        return mat.reshape(n_blk * 5, n_blk * 3)

    return expand(base_block), expand(mu_block)


def friction_basis_blocks(dtype=jnp.float32):
    """The (5,3) per-(step,leg) blocks of the shared constraint basis:
    A(mu) is BLOCK-DIAGONAL with H*4 copies of ``base + mu * slope`` down
    the diagonal (5 rows / 3 force components per leg-step). Exposing the
    blocks lets the batched KKT assembly compute A' diag(w) A as 40 tiny
    3x3 products instead of a dense (200,120)x(200,120) contraction."""
    one = jnp.ones((), dtype)
    zero = jnp.zeros((), dtype)
    base = jnp.stack([
        jnp.stack([one, zero, zero]),
        jnp.stack([one, zero, zero]),
        jnp.stack([zero, one, zero]),
        jnp.stack([zero, one, zero]),
        jnp.stack([zero, zero, one]),
    ])  # (5,3)
    slope = jnp.stack([
        jnp.stack([zero, zero, one]),
        jnp.stack([zero, zero, -one]),
        jnp.stack([zero, zero, one]),
        jnp.stack([zero, zero, -one]),
        jnp.stack([zero, zero, zero]),
    ])
    return base, slope


def mpc_bounds(contacts: jnp.ndarray, fz_min: jnp.ndarray,
               fz_max: jnp.ndarray, horizon: int = PLAN_HORIZON,
               dtype=jnp.float32):
    """(H*20,) lower/upper bounds. The *current* tick's contact flags gate all
    horizon steps (reference quirk, ConvexMpc.cpp:228-245)."""
    inf = jnp.asarray(jnp.inf, dtype)
    c = contacts.astype(dtype)  # (4,)
    lb_leg = jnp.stack([jnp.zeros_like(c), -inf * jnp.ones_like(c),
                        jnp.zeros_like(c), -inf * jnp.ones_like(c),
                        fz_min * c], axis=-1)  # (4,5)
    ub_leg = jnp.stack([inf * jnp.ones_like(c), jnp.zeros_like(c),
                        inf * jnp.ones_like(c), jnp.zeros_like(c),
                        fz_max * c], axis=-1)
    lb = jnp.tile(lb_leg.reshape(-1), horizon)
    ub = jnp.tile(ub_leg.reshape(-1), horizon)
    return lb, ub


def reference_mpc_problem(params, horizon: int = PLAN_HORIZON,
                          dtype=jnp.float32):
    """A representative MPC QP instance (nominal stand, all feet in
    contact) used to precompute per-scenario solver state at init."""
    euler = jnp.zeros(3, dtype)
    rot = jnp.eye(3, dtype=dtype)
    dt = jnp.asarray(0.0025, dtype)
    a_c = continuous_a(euler)
    b_c = continuous_b(params.robot_mass, params.trunk_inertia, rot,
                       params.default_foot_pos)
    _, b_d = discretize(a_c, b_c, dt)
    b_d_list = jnp.broadcast_to(b_d, (horizon,) + b_d.shape)
    a_qp, b_qp = condense(a_c, b_d_list, dt, horizon)
    x0 = jnp.zeros(MPC_STATE_DIM, dtype).at[5].set(0.3).at[12].set(-9.8)
    x_ref = jnp.tile(x0, horizon)
    p_mat, q_vec = mpc_cost(a_qp, b_qp, params.q_weights, params.r_weights,
                            x0, x_ref, horizon)
    a_mat = friction_constraint_matrix(params.mu_mpc, horizon, dtype)
    lb, ub = mpc_bounds(jnp.ones(4, bool), params.fz_min, params.fz_max,
                        horizon, dtype)
    return p_mat, q_vec, a_mat, lb, ub


def reference_mpc_scaling(params, horizon: int = PLAN_HORIZON,
                          dtype=jnp.float32):
    """Equilibration for the MPC problem family, computed once from a
    representative instance. Used to skip the per-solve Ruiz sweep
    (see ops/qp.Scaling)."""
    from a1_qp_mpc_controller_tpu.ops import qp as qpx

    p_mat, q_vec, a_mat, lb, ub = reference_mpc_problem(params, horizon,
                                                        dtype)
    return qpx.compute_scaling(p_mat, q_vec, a_mat, lb, ub, 10)


def eliminate_swing(p_mat, q_vec, lb, ub, contacts, horizon: int):
    """Swing-leg variable elimination (static-shape mask form).

    The reference pins swing-leg forces to zero through EQUALITY
    constraint rows (contact flag gating the bounds,
    ConvexMpc.cpp:228-245), which OSQP stiffens 1e3x. Those rows put the
    scaled KKT at kappa ~ 5e4 and the equality SET changes at every
    contact flip — invalidating the carried ADMM stepsize and duals
    exactly when the solve is hardest (~100 N first-tick force
    transients at a fixed 50-iteration budget, measured).

    This eliminates the swing variables structurally instead: zero
    their P rows/columns (unit diagonal), zero their q entries, and
    LOOSEN their constraint rows. The optimum is unchanged (swing
    forces solve to exactly 0 either way; verified to 2e-3 N against
    the pinned problem's float64 optimum on captured flip instances)
    but the family has NO equality rows at any contact state: kappa
    drops to ~1e3 and every captured flip instance converges within 50
    fixed iterations. Shapes stay static — the TPU-native (masked)
    form of variable elimination."""
    dtype = p_mat.dtype
    s_var = jnp.tile(jnp.repeat(contacts, 3), horizon)   # (H*12,)
    s_row = jnp.tile(jnp.repeat(contacts, 5), horizon)   # (H*20,)
    sf = s_var.astype(dtype)
    p2 = p_mat * (sf[:, None] * sf[None, :]) + jnp.diag(1.0 - sf)
    q2 = q_vec * sf
    inf = jnp.asarray(jnp.inf, dtype)
    lb2 = jnp.where(s_row, lb, -inf)
    ub2 = jnp.where(s_row, ub, inf)
    return p2, q2, lb2, ub2


def contact_patterns(dtype=bool) -> jnp.ndarray:
    """(16, 4) table of all contact patterns; row index is the pattern id
    ``contacts . [8, 4, 2, 1]``."""
    bits = (jnp.arange(16)[:, None] // jnp.array([8, 4, 2, 1])[None, :]) % 2
    return bits.astype(dtype)


def reference_mpc_scaling_table(params, horizon: int = PLAN_HORIZON,
                                dtype=jnp.float32):
    """Per-contact-pattern equilibration table: Scaling with a leading
    16 axis, one entry per contact pattern (id = contacts . [8,4,2,1]).

    The swing-eliminated problem family (see :func:`eliminate_swing`)
    differs per contact pattern — swing columns become unit diagonals —
    so a single all-contact scaling preconditions 2-stance trot
    instances poorly (measured: walk-start flip solves stall at ~30-50 N
    with the standing scaling but converge < 1 N with a pattern-matched
    one). 16 precomputed Ruiz sweeps at init, a gather per tick."""
    from a1_qp_mpc_controller_tpu.ops import qp as qpx

    p_mat, q_vec, a_mat, lb, ub = reference_mpc_problem(params, horizon,
                                                        dtype)

    def one(c):
        p2, q2, l2, u2 = eliminate_swing(p_mat, q_vec, lb, ub, c, horizon)
        return qpx.compute_scaling(p2, q2, a_mat, l2, u2, 10)

    return jax.vmap(one)(contact_patterns())


def reference_kkt_inverse(params, scaling, rho: float,
                          horizon: int = PLAN_HORIZON,
                          eq_scale: float = 1.0, dtype=jnp.float32):
    """Exact scaled-KKT inverse at the representative instance — the seed
    for the Newton-Schulz solver mode (one Cholesky at init, none in the
    hot path)."""
    from a1_qp_mpc_controller_tpu.ops import qp as qpx

    p_mat, q_vec, a_mat, lb, ub = reference_mpc_problem(params, horizon,
                                                        dtype)
    sp = qpx.apply_scaling(p_mat, q_vec, a_mat, lb, ub, scaling)
    rho_vec = qpx._rho_vec(sp.l, sp.u, jnp.asarray(rho, dtype), eq_scale)
    return qpx._kkt_inverse(sp.P, sp.A, rho_vec, 1e-6)


def build_reference_trajectory(root_euler, root_pos, root_pos_d, root_euler_d,
                               root_ang_vel_d, root_lin_vel_d_world, dt,
                               horizon: int = PLAN_HORIZON):
    """(H*13,) desired state trajectory. Parity: A1RobotControl.cpp:470-488 —
    constant desired roll/pitch & rates, yaw and xy-position integrated from
    the current state at the commanded rates, fixed desired height, zero
    desired vz, gravity -9.8."""
    dtype = root_euler.dtype
    steps = jnp.arange(1, horizon + 1, dtype=dtype) * dt  # (H,)
    zeros = jnp.zeros_like(steps)
    ones = jnp.ones_like(steps)
    traj = jnp.stack([
        root_euler_d[0] * ones,
        root_euler_d[1] * ones,
        root_euler[2] + root_ang_vel_d[2] * steps,
        root_pos[0] + root_lin_vel_d_world[0] * steps,
        root_pos[1] + root_lin_vel_d_world[1] * steps,
        root_pos_d[2] * ones,
        root_ang_vel_d[0] * ones,
        root_ang_vel_d[1] * ones,
        root_ang_vel_d[2] * ones,
        root_lin_vel_d_world[0] * ones,
        root_lin_vel_d_world[1] * ones,
        zeros,
        -9.8 * ones,
    ], axis=-1)  # (H, 13)
    return traj.reshape(-1)
