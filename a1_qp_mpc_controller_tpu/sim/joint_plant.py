"""Joint-space articulated plant: floating-base rigid-body dynamics of the
full 18-DoF quadruped (trunk + 4x3 revolute joints) with KKT pinned-foot
contact.

This is the higher-fidelity alternative to the single-rigid-body plant in
``sim/plant.py``. The reference validates against Gazebo's full-URDF
physics (SURVEY.md §4); the SRB plant's massless-leg / virtual-foot-mass
swing model is too soft an approximation for profiles whose swing-leg PD
gains were tuned against real leg inertia (the Isaac profiles, kp_foot
3250-4250). Here joint torques act on actual link inertias, so those
profiles can be exercised faithfully — entirely on-device, batched, and
with static shapes.

Formulation (TPU-friendly dense operator algebra, not a Featherstone
recursion — at 18 DoF the mass matrix is a tiny dense matrix and XLA fuses
the whole assembly into a handful of GEMMs):

- Generalized velocity ``u = [v_b (world), w_b (world), qd (12)]``.
- Per-link body-frame COM positions/rotations/joint axes are closed-form in
  the leg angles; their joint derivatives come from ``jax.jacfwd`` and the
  velocity-product ("bias") accelerations from ``jax.jvp`` along the flow —
  no hand-derived Coriolis terms to maintain.
- Mass matrix ``M = sum_i Jv_i' m_i Jv_i + Jw_i' I_i^w Jw_i`` over the 12
  leg links + trunk; bias ``b`` via d'Alembert with the same Jacobians.
- Contact: feet pin to the terrain on touchdown (matching ``sim/plant.py``
  and Gazebo's constraint solver). Pinned feet add rows
  ``J_c u_dot = -a_c^0 - stabilization`` to a symmetric 30x30 KKT system;
  inactive feet are masked by zeroing their rows and placing 1 on the dual
  diagonal (static shapes, no gather/scatter). One factorization serves
  both the acceleration solve and the inelastic touchdown impulse
  projection (two RHS columns).
- Release when the constraint normal force lambda_z < 0 (the ground can
  only push).

Link mass/inertia constants approximate the public Unitree A1 URDF; the
trunk takes ``robot_mass - 4 * leg_mass`` and ``trunk_inertia`` from
``RobotParams`` so the controller's model and the plant agree on totals.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from a1_qp_mpc_controller_tpu.config import NUM_LEG, RobotParams
from a1_qp_mpc_controller_tpu.models import kinematics as kin
from a1_qp_mpc_controller_tpu.sim import terrain as terrain_mod
from a1_qp_mpc_controller_tpu.types import SensorData
from a1_qp_mpc_controller_tpu.utils import mathx

GRAV = jnp.array([0.0, 0.0, -9.81])

# --- link constants (approximate A1 URDF; COM lateral offsets mirror with
# the motor-offset sign of each leg)
HIP_MASS = 0.696
THIGH_MASS = 1.013
CALF_MASS = 0.286            # calf 0.226 + foot 0.06 lumped
LEG_MASS = HIP_MASS + THIGH_MASS + CALF_MASS
LINK_MASSES = jnp.array([HIP_MASS, THIGH_MASS, CALF_MASS])
# inertia about each link COM, link frame
LINK_INERTIAS = jnp.stack([
    jnp.diag(jnp.array([4.7e-4, 8.1e-4, 5.5e-4])),   # hip
    jnp.diag(jnp.array([5.5e-3, 5.1e-3, 1.4e-3])),   # thigh
    jnp.diag(jnp.array([4.2e-3, 4.2e-3, 3.3e-5])),   # calf+foot
])
THIGH_COM = jnp.array([0.0, 0.0223, -0.03])   # y mirrored per side
CALF_COM = jnp.array([0.0, 0.0, -0.146])

JOINT_DAMPING = 0.01     # N m s / rad, URDF-style viscous joint damping
TORQUE_LIMIT = 33.5      # N m, A1 URDF actuator effort limit — Gazebo and
                         # Isaac clamp commanded efforts at the joint, so
                         # the plant must too (stiff swing-PD profiles rely
                         # on this saturation)
NU = 6 + 3 * NUM_LEG     # 18 generalized velocities
NC = 3 * NUM_LEG         # 12 contact constraint rows


def _rot_x(a):
    s, c = jnp.sin(a), jnp.cos(a)
    return jnp.array([[1.0, 0.0, 0.0], [0.0, c, -s], [0.0, s, c]])


def _rot_y(a):
    s, c = jnp.sin(a), jnp.cos(a)
    return jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])


def _leg_links(q, rho_fix):
    """Body-frame link quantities for one leg at joint angles ``q`` (3,).

    Returns (coms (3,3), rots (3,3,3), axes (3,3)): per-link COM positions
    and orientations, and the three joint axes, all in the trunk frame.
    Chain matches models/kinematics.py (hip roll about +x at the mount,
    hip pitch / knee pitch about +y).
    """
    ox, oy, d, lu = rho_fix[0], rho_fix[1], rho_fix[2], rho_fix[3]
    side = jnp.sign(d)
    rx0 = _rot_x(q[0])
    ry1 = _rot_y(q[1])
    r_hip = rx0
    r_thigh = rx0 @ ry1
    r_calf = rx0 @ _rot_y(q[1] + q[2])

    h0 = jnp.array([1.0, 0.0, 0.0]) * ox + jnp.array([0.0, 1.0, 0.0]) * oy
    o1 = h0 + rx0 @ jnp.array([0.0, 1.0, 0.0]) * d
    o2 = o1 + r_thigh @ jnp.array([0.0, 0.0, -1.0]) * lu

    com_hip = h0 + r_hip @ (jnp.array([0.0, 0.4, 0.0]) * d)
    com_thigh = o1 + r_thigh @ (THIGH_COM * jnp.array([1.0, side, 1.0]))
    com_calf = o2 + r_calf @ CALF_COM

    coms = jnp.stack([com_hip, com_thigh, com_calf])
    rots = jnp.stack([r_hip, r_thigh, r_calf])
    ax = rx0 @ jnp.array([0.0, 1.0, 0.0])
    axes = jnp.stack([jnp.array([1.0, 0.0, 0.0]), ax, ax])
    return coms, rots, axes


def _leg_kin(q, qd, rho_fix):
    """All per-leg dynamic quantities: positions, joint derivatives, and
    velocity-product (bias) terms via jvp along the joint flow."""
    coms, rots, axes = _leg_links(q, rho_fix)
    dcom_dq = jax.jacfwd(lambda qq: _leg_links(qq, rho_fix)[0])(q)

    # lower-triangular joint participation: link k moves with joints j<=k
    tri = jnp.tril(jnp.ones((3, 3), q.dtype))              # (link, joint)
    jw_cols = axes[None, :, :] * tri[:, :, None]            # (link,joint,3)
    omega_rel = jnp.einsum("lja,j->la", jw_cols, qd)        # (link,3)

    def vel_quants(qq):
        c, _, a = _leg_links(qq, rho_fix)
        dc = jax.jacfwd(lambda q2: _leg_links(q2, rho_fix)[0])(qq)
        cdot = jnp.einsum("laj,j->la", dc, qd)
        om = jnp.einsum("lja,j->la", a[None, :, :] * tri[:, :, None], qd)
        return cdot, om

    (cdot, _), (cddot0, omdot0) = jax.jvp(vel_quants, (q,), (qd,))

    # foot point (for contact rows)
    p_f = kin.fk(q, jnp.zeros(3, q.dtype), rho_fix)
    j_f = kin.jac(q, jnp.zeros(3, q.dtype), rho_fix)
    pdot_f, pddot0_f = jax.jvp(
        lambda qq: kin.jac(qq, jnp.zeros(3, q.dtype), rho_fix) @ qd,
        (q,), (qd,))

    return dict(coms=coms, rots=rots, dcom_dq=dcom_dq, jw_cols=jw_cols,
                omega_rel=omega_rel, cdot=cdot, cddot0=cddot0,
                omdot0=omdot0, p_f=p_f, j_f=j_f, pdot_f=pdot_f,
                pddot0_f=pddot0_f)


def _dynamics_terms(params: RobotParams, rot: jnp.ndarray, qj: jnp.ndarray,
                    u: jnp.ndarray):
    """Mass matrix M (18,18), bias+gravity rhs0 = tau_zero - b (18,), foot
    Jacobians Jc (4,3,18) (world), foot bias accelerations (4,3), and foot
    world velocities (4,3). ``rot`` is the trunk rotation, ``qj`` (4,3)."""
    vb, wb = u[:3], u[3:6]
    qd = u[6:].reshape(NUM_LEG, 3)
    lk = jax.vmap(_leg_kin, in_axes=(0, 0, 0))(qj, qd, params.rho_fix)

    # world-frame per-link quantities, flattened over (leg, link)
    def flat(x):
        return x.reshape((NUM_LEG * 3,) + x.shape[2:])

    coms = flat(lk["coms"])                      # (12,3) body frame
    rots_l = flat(lk["rots"])                    # (12,3,3)
    dcom = flat(lk["dcom_dq"])                   # (12,3,3) d com / d q_leg
    jw_cols = flat(lk["jw_cols"])                # (12,3joint,3)
    om_rel = flat(lk["omega_rel"])               # (12,3)
    cdot = flat(lk["cdot"])
    cddot0 = flat(lk["cddot0"])
    omdot0 = flat(lk["omdot0"])

    rc = coms @ rot.T                            # R c, (12,3) world
    rcd = cdot @ rot.T
    masses = jnp.tile(LINK_MASSES, NUM_LEG)      # (12,)

    # --- Jacobians (12,3,18): [I | -skew(Rc) | R dcom/dq into leg cols]
    eye3 = jnp.eye(3, dtype=u.dtype)
    leg_idx = jnp.repeat(jnp.arange(NUM_LEG), 3)             # (12,)
    onehot = jax.nn.one_hot(leg_idx, NUM_LEG, dtype=u.dtype)  # (12,4)
    # joint-block columns (12,3,4legs,3joints) -> leg-major flat layout
    jv_joint = jnp.einsum("ab,lbj,lk->lakj", rot, dcom, onehot)
    jw_joint = jnp.einsum("ab,ljb,lk->lakj", rot, jw_cols, onehot)
    jv = jnp.concatenate([
        jnp.broadcast_to(eye3, (NUM_LEG * 3, 3, 3)),
        -jax.vmap(mathx.skew)(rc),
        jv_joint.reshape(NUM_LEG * 3, 3, NC)], axis=2)
    jw = jnp.concatenate([
        jnp.zeros((NUM_LEG * 3, 3, 3), u.dtype),
        jnp.broadcast_to(eye3, (NUM_LEG * 3, 3, 3)),
        jw_joint.reshape(NUM_LEG * 3, 3, NC)], axis=2)

    # world link rotational inertias
    rl_w = jnp.einsum("ab,lbc->lac", rot, rots_l)
    iw = jnp.einsum("lab,lbc,ldc->lad", rl_w,
                    jnp.tile(LINK_INERTIAS.astype(u.dtype), (NUM_LEG, 1, 1)),
                    rl_w)

    # --- mass matrix
    trunk_mass = jnp.maximum(params.robot_mass - NUM_LEG * LEG_MASS, 1.0)
    i_tr_w = rot @ params.trunk_inertia @ rot.T
    m_mat = (jnp.einsum("l,lai,laj->ij", masses, jv, jv)
             + jnp.einsum("lai,lab,lbj->ij", jw, iw, jw))
    m_mat = m_mat.at[:3, :3].add(trunk_mass * eye3)
    m_mat = m_mat.at[3:6, 3:6].add(i_tr_w)

    # --- bias forces (u_dot = 0 velocity products) + gravity
    om_rel_w = om_rel @ rot.T
    w_link = wb[None, :] + om_rel_w                           # (12,3)
    a0 = (jnp.cross(wb[None, :], jnp.cross(wb[None, :], rc))
          + 2.0 * jnp.cross(wb[None, :], rcd)
          + cddot0 @ rot.T)                                   # (12,3)
    alpha0 = jnp.cross(wb[None, :], om_rel_w) + omdot0 @ rot.T
    gyro = (jnp.einsum("lab,lb->la", iw, alpha0)
            + jnp.cross(w_link, jnp.einsum("lab,lb->la", iw, w_link)))
    grav_f = masses[:, None] * GRAV[None, :].astype(u.dtype)
    b = (jnp.einsum("lai,la->i", jv, masses[:, None] * a0 - grav_f)
         + jnp.einsum("lai,la->i", jw, gyro))
    b = b.at[3:6].add(jnp.cross(wb, i_tr_w @ wb))
    b = b.at[:3].add(-trunk_mass * GRAV.astype(u.dtype))

    # --- foot contact rows
    p_f_w = lk["p_f"] @ rot.T                                 # (4,3)
    jc_joint = jnp.einsum("ab,lbj,lk->lakj", rot, lk["j_f"],
                          jnp.eye(NUM_LEG, dtype=u.dtype))
    jc = jnp.concatenate([
        jnp.broadcast_to(eye3, (NUM_LEG, 3, 3)),
        -jax.vmap(mathx.skew)(p_f_w),
        jc_joint.reshape(NUM_LEG, 3, NC)], axis=2)
    a0_f = (jnp.cross(wb[None, :], jnp.cross(wb[None, :], p_f_w))
            + 2.0 * jnp.cross(wb[None, :], lk["pdot_f"] @ rot.T)
            + lk["pddot0_f"] @ rot.T)
    v_f = (vb[None, :] + jnp.cross(wb[None, :], p_f_w)
           + lk["pdot_f"] @ rot.T)
    return m_mat, b, jc, a0_f, v_f, p_f_w


class JointPlantState(struct.PyTreeNode):
    root_pos: jnp.ndarray       # (3,) world
    root_quat: jnp.ndarray      # (4,) w,x,y,z
    root_lin_vel: jnp.ndarray   # (3,) world
    root_ang_vel: jnp.ndarray   # (3,) world
    joint_pos: jnp.ndarray      # (12,)
    joint_vel: jnp.ndarray      # (12,)
    foot_pos: jnp.ndarray       # (4,3) world (FK cache)
    foot_vel: jnp.ndarray       # (4,3) world
    in_contact: jnp.ndarray     # (4,) bool
    pin_anchor: jnp.ndarray     # (4,3) world pin points
    foot_force_n: jnp.ndarray   # (4,) constraint normal force (sensor)


def init_standing(params: RobotParams, terrain: terrain_mod.Terrain,
                  height: float = 0.3, dtype=jnp.float32
                  ) -> JointPlantState:
    """Standing at the default stance, feet pinned on the terrain."""
    foot_xy = params.default_foot_pos[:, :2]
    foot_z = terrain_mod.height(terrain, foot_xy[:, 0], foot_xy[:, 1])
    foot_pos = jnp.concatenate([foot_xy, foot_z[:, None]], axis=1)
    root_pos = jnp.array([0.0, 0.0, height], dtype) + jnp.array(
        [0.0, 0.0, 1.0], dtype) * jnp.mean(foot_z)
    rel = foot_pos - root_pos[None, :]
    q = kin.ik_all_legs(rel, params.rho_opt, params.rho_fix, None, 12)
    return JointPlantState(
        root_pos=root_pos,
        root_quat=jnp.array([1.0, 0, 0, 0], dtype),
        root_lin_vel=jnp.zeros(3, dtype),
        root_ang_vel=jnp.zeros(3, dtype),
        joint_pos=q.reshape(-1),
        joint_vel=jnp.zeros(NC, dtype),
        foot_pos=foot_pos,
        foot_vel=jnp.zeros((NUM_LEG, 3), dtype),
        in_contact=jnp.ones(NUM_LEG, bool),
        pin_anchor=foot_pos,
        foot_force_n=jnp.full((NUM_LEG,), 0.25 * 13.0 * 9.81, dtype),
    )


def _substep(params: RobotParams, terrain: terrain_mod.Terrain,
             ps: JointPlantState, tau: jnp.ndarray, dt: jnp.ndarray
             ) -> JointPlantState:
    rot = mathx.quat_to_rot(ps.root_quat)
    qj = ps.joint_pos.reshape(NUM_LEG, 3)
    u = jnp.concatenate([ps.root_lin_vel, ps.root_ang_vel, ps.joint_vel])

    m_mat, b, jc, a0_f, v_f, p_f_w = _dynamics_terms(params, rot, qj, u)
    foot_w = ps.root_pos[None, :] + p_f_w

    # --- contact transitions
    gz = terrain_mod.height(terrain, foot_w[:, 0], foot_w[:, 1])
    touchdown = ((~ps.in_contact) & (foot_w[:, 2] <= gz)
                 & (v_f[:, 2] <= 0.0))
    in_contact = ps.in_contact | touchdown
    anchor = jnp.where(
        touchdown[:, None],
        jnp.concatenate([foot_w[:, :2], gz[:, None]], axis=1),
        ps.pin_anchor)

    # --- masked symmetric KKT: [[M, Jc'], [Jc, -D]]; inactive feet get
    # zeroed rows and unit dual diagonal => lambda = 0, static shapes.
    cmask = jnp.repeat(in_contact, 3)
    jc_flat = jnp.where(cmask[:, None], jc.reshape(NC, NU), 0.0)
    dual_d = jnp.where(cmask, 1e-8, 1.0)
    kkt = jnp.zeros((NU + NC, NU + NC), u.dtype)
    kkt = kkt.at[:NU, :NU].set(m_mat)
    kkt = kkt.at[:NU, NU:].set(jc_flat.T)
    kkt = kkt.at[NU:, :NU].set(jc_flat)
    kkt = kkt.at[NU:, NU:].set(-jnp.diag(dual_d))

    tau_act = jnp.clip(tau, -TORQUE_LIMIT, TORQUE_LIMIT)
    tau_gen = jnp.concatenate([
        jnp.zeros(6, u.dtype), tau_act - JOINT_DAMPING * ps.joint_vel])
    # Baumgarte position stabilization on the pin anchors (critically
    # damped, omega ~ 0.1/dt — gentle next to the per-substep velocity
    # projection below, which keeps Jc u ~ 0 anyway)
    omega_s = 0.1 / dt
    phi = foot_w - anchor
    stab = (2.0 * omega_s * v_f + (omega_s ** 2) * phi).reshape(NC)
    rhs_acc = jnp.concatenate([tau_gen - b,
                               jnp.where(cmask, -(a0_f.reshape(NC) + stab),
                                         0.0)])
    # inelastic impulse projection (Jc u+ = 0): same KKT, second RHS
    rhs_imp = jnp.concatenate([m_mat @ u, jnp.zeros(NC, u.dtype)])
    sol = jnp.linalg.solve(kkt, jnp.stack([rhs_acc, rhs_imp], axis=1))
    udot, nu_acc = sol[:NU, 0], sol[NU:, 0]
    u_proj = sol[:NU, 1]
    lam = -nu_acc.reshape(NUM_LEG, 3)            # world constraint force

    # ground can only push: release feet whose normal force went negative
    release = in_contact & (lam[:, 2] < 0.0)
    fn = jnp.where(in_contact & ~release, jnp.maximum(lam[:, 2], 0.0), 0.0)
    in_contact = in_contact & ~release

    # --- semi-implicit Euler on the projected velocity
    u_new = u_proj + dt * udot
    vb, wb, qd = u_new[:3], u_new[3:6], u_new[6:]
    root_pos = ps.root_pos + dt * vb
    root_quat = _quat_integrate(ps.root_quat, wb, dt)
    joint_pos = ps.joint_pos + dt * qd

    # FK caches for the next substep / sensors
    rot2 = mathx.quat_to_rot(root_quat)
    p_rel = kin.fk_all_legs(joint_pos.reshape(NUM_LEG, 3), params.rho_opt,
                            params.rho_fix)
    foot_pos = root_pos[None, :] + p_rel @ rot2.T
    jacs = kin.jac_all_legs(joint_pos.reshape(NUM_LEG, 3), params.rho_opt,
                            params.rho_fix)
    rel_vel = jnp.einsum("lij,lj->li", jacs, qd.reshape(NUM_LEG, 3))
    foot_vel = (vb[None, :]
                + jnp.cross(wb[None, :], p_rel @ rot2.T)
                + rel_vel @ rot2.T)

    return ps.replace(
        root_pos=root_pos, root_quat=root_quat, root_lin_vel=vb,
        root_ang_vel=wb, joint_pos=joint_pos, joint_vel=qd,
        foot_pos=foot_pos, foot_vel=foot_vel, in_contact=in_contact,
        pin_anchor=anchor, foot_force_n=fn)


def _quat_integrate(q: jnp.ndarray, omega_world: jnp.ndarray,
                    dt: jnp.ndarray) -> jnp.ndarray:
    angle = jnp.linalg.norm(omega_world) * dt
    axis = omega_world / jnp.maximum(jnp.linalg.norm(omega_world), 1e-9)
    half = 0.5 * angle
    dq = jnp.concatenate([jnp.cos(half)[None], jnp.sin(half) * axis])
    w1, v1 = dq[0], dq[1:]
    w2, v2 = q[0], q[1:]
    w = w1 * w2 - v1 @ v2
    v = w1 * v2 + w2 * v1 + jnp.cross(v1, v2)
    out = jnp.concatenate([w[None], v])
    return out / jnp.linalg.norm(out)


@partial(jax.jit, static_argnames=("substeps",))
def plant_step(params: RobotParams, terrain: terrain_mod.Terrain,
               ps: JointPlantState, joint_torques: jnp.ndarray,
               dt: jnp.ndarray, substeps: int = 10) -> JointPlantState:
    """Advance one control period under constant joint torques."""
    sub_dt = dt / substeps

    def body(carry, _):
        return _substep(params, terrain, carry, joint_torques, sub_dt), None

    ps, _ = jax.lax.scan(body, ps, None, length=substeps)
    return ps


@jax.jit
def read_sensors(params: RobotParams, ps: JointPlantState,
                 prev_root_lin_vel: jnp.ndarray,
                 dt: jnp.ndarray) -> SensorData:
    """Sensor snapshot — joint encoders are direct state here (no IK)."""
    rot = mathx.quat_to_rot(ps.root_quat)
    acc_world = (ps.root_lin_vel - prev_root_lin_vel) / dt
    imu_acc = rot.T @ (acc_world - GRAV)
    imu_gyro = rot.T @ ps.root_ang_vel
    return SensorData(
        root_quat=ps.root_quat,
        root_pos=ps.root_pos,
        root_lin_vel=ps.root_lin_vel,
        imu_acc=imu_acc,
        imu_ang_vel=imu_gyro,
        joint_pos=ps.joint_pos,
        joint_vel=ps.joint_vel,
        foot_force=ps.foot_force_n,
    )
