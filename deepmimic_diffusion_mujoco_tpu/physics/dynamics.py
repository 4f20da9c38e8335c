"""Forward rigid-body dynamics for the DeepMimic humanoid, pure JAX.

The reference never calls `mj_step` (its playback is kinematic,
mocap_player.py:31; README.md:46 admits "not physically accurate") but its
model file defines a full dynamical system — RK4, joint armature 0.02,
damping 5, stiffness 10, torque actuators (dp_env_v2.xml:4,9,110-145). This
module implements that system TPU-natively so the tracking-reward stack has
a real physics mode (BASELINE north-star config 5):

- **Mass matrix** via composite-rigid-body quadratic form
  M = sum_b [m_b Jv_b^T Jv_b + Jw_b^T I_b^w Jw_b] + diag(armature), with
  body COM Jacobians assembled from per-DOF world axes/anchors produced by
  an augmented FK pass. Body masses/inertias are derived from the geom
  spec (humanoid_model.py) with MuJoCo's solid-shape formulas
  (sphere/capsule/box, `inertiafromgeom="true"`), validated against the
  compiled MuJoCo model in tests.
- **Bias forces** (Coriolis/centrifugal + gravity) with ZERO hand-derived
  dynamics algebra: body COM velocities/accelerations along the exact
  qacc=0 trajectory are obtained by nested `jax.jvp` through the position
  kinematics (root quaternion advanced on the exponential map), then
  Newton-Euler is applied per body and mapped back through the Jacobians.
  This matches MuJoCo's RNE exactly (tested vs `qfrc_bias` to ~1e-5).
- **Passive forces**: per-hinge spring/damper (the XML's stiffness 10 /
  damping 5) and soft joint-limit penalties.
- **Contacts**: penalty spring-damper with regularized Coulomb friction
  (mu = 1, the floor's friction, dp_env_v2.xml:19) at geom support points
  (box corners, sphere/capsule cap centers). MuJoCo uses a PGS constraint
  solver (dp_env_v2.xml:9) so contact-phase agreement is statistical, not
  bitwise; the smooth-dynamics phase is exact.
- **Integration**: semi-implicit Euler, velocity first, root quaternion on
  the exponential map; free-joint angular velocity is BODY-frame (MuJoCo's
  free-joint convention, verified empirically).

Everything is a pure function of (qpos, qvel, tau); `DynamicsEnv` wraps it
with vmapped batching, DeepMimic PD torques toward a target pose
(PARAMS_KP_KD, mocap_util.py:22-25), and the tracking reward.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.skeleton import PARAMS_KP_KD, QPOS_JOINT_SLICES
from .humanoid_model import (
    BODIES,
    BODY_INDEX,
    FLOOR_FRICTION,
    GRAVITY,
    JOINT_ARMATURE,
    JOINT_DAMPING,
    JOINT_STIFFNESS,
)
from .kinematics import quat_mul, quat_rotate, quat_from_axis_angle

NB = len(BODIES)           # 13 bodies
NJ = 28                    # hinge DOFs
NV = 6 + NJ                # free root + hinges
NQ = 7 + NJ


# ---------------------------------------------------------------------------
# Static tables: mass properties, joint topology, contact points
# ---------------------------------------------------------------------------


def _geom_inertia(g) -> np.ndarray:
    """Solid-shape inertia about the geom COM, body-frame axes (diagonal:
    every capsule in the spec is z-aligned, boxes axis-aligned). MuJoCo's
    `inertiafromgeom` formulas."""
    m = g.mass
    if g.kind == "sphere":
        r = g.size[0]
        i = 0.4 * m * r * r
        return np.diag([i, i, i])
    if g.kind == "box":
        hx, hy, hz = g.size
        return np.diag([
            m / 3.0 * (hy * hy + hz * hz),
            m / 3.0 * (hx * hx + hz * hz),
            m / 3.0 * (hx * hx + hy * hy),
        ])
    if g.kind == "capsule":
        r = g.size[0]
        zlo, zhi = g.fromto[2], g.fromto[5]
        hl = abs(zhi - zlo) / 2.0
        v_cyl = np.pi * r * r * (2 * hl)
        v_sph = 4.0 / 3.0 * np.pi * r**3
        mc = m * v_cyl / (v_cyl + v_sph)
        ms = m - mc
        izz = mc * r * r / 2.0 + 0.4 * ms * r * r
        ixx = (
            mc * (hl * hl / 3.0 + r * r / 4.0)
            + ms * (0.4 * r * r + hl * hl + 0.75 * hl * r)
        )
        return np.diag([ixx, ixx, izz])
    raise ValueError(g.kind)


def _mass_tables():
    """Per-body mass, COM (body frame) and inertia about the COM."""
    mass = np.zeros((NB,))
    com = np.zeros((NB, 3))
    inertia = np.zeros((NB, 3, 3))
    for bi, b in enumerate(BODIES):
        ms = np.asarray([g.mass for g in b.geoms])
        cs = np.asarray([g.com for g in b.geoms])
        mass[bi] = ms.sum()
        com[bi] = (ms[:, None] * cs).sum(0) / mass[bi]
        ine = np.zeros((3, 3))
        for g, c in zip(b.geoms, cs):
            d = c - com[bi]
            ine += _geom_inertia(g) + g.mass * (np.dot(d, d) * np.eye(3) - np.outer(d, d))
        inertia[bi] = ine
    return mass, com, inertia


BODY_MASS, BODY_COM, BODY_INERTIA = _mass_tables()


def _joint_tables():
    """Per-hinge static data + the (body, dof) ancestor mask."""
    jbody, jaxis, janchor, jwithin = [], [], [], []
    kp, kd, lo, hi = [], [], [], []
    for b in BODIES[1:]:
        gains = PARAMS_KP_KD[b.name]
        for k, h in enumerate(b.joints):
            jbody.append(BODY_INDEX[b.name])
            jaxis.append(h.axis)
            janchor.append(h.pos)
            jwithin.append(k)
            kp.append(gains[0])
            kd.append(gains[1])
            lo.append(np.deg2rad(h.range_deg[0]))
            hi.append(np.deg2rad(h.range_deg[1]))
    jbody = np.asarray(jbody, np.int32)
    # ancestor-or-self: DOF j affects body b iff j's body is on b's chain
    parent = np.asarray(
        [-1] + [BODY_INDEX[b.parent] for b in BODIES[1:]], np.int32
    )
    mask = np.zeros((NB, NJ), np.float32)
    for bi in range(NB):
        a = bi
        while a >= 0:
            mask[bi, jbody == a] = 1.0
            a = parent[a]
    return (
        jbody,
        np.asarray(jaxis, np.float32),
        np.asarray(janchor, np.float32),
        mask,
        np.asarray(kp, np.float32),
        np.asarray(kd, np.float32),
        np.asarray(lo, np.float32),
        np.asarray(hi, np.float32),
    )


(JOINT_BODY, JOINT_AXIS, JOINT_ANCHOR, ANCESTOR_MASK,
 PD_KP, PD_KD, LIMIT_LO, LIMIT_HI) = _joint_tables()


def _contact_tables():
    """Support points: (body, local point, effective radius). Boxes
    contribute their 8 corners (radius 0); spheres their center (radius r);
    capsules both cap centers (radius r)."""
    body, point, radius = [], [], []
    for bi, b in enumerate(BODIES):
        for g in b.geoms:
            if g.kind == "sphere":
                body.append(bi); point.append(g.pos); radius.append(g.size[0])
            elif g.kind == "capsule":
                body.append(bi); point.append(g.fromto[:3]); radius.append(g.size[0])
                body.append(bi); point.append(g.fromto[3:]); radius.append(g.size[0])
            elif g.kind == "box":
                hx, hy, hz = g.size
                for sx in (-1, 1):
                    for sy in (-1, 1):
                        for sz in (-1, 1):
                            body.append(bi)
                            point.append((g.pos[0] + sx * hx,
                                          g.pos[1] + sy * hy,
                                          g.pos[2] + sz * hz))
                            radius.append(0.0)
    return (np.asarray(body, np.int32), np.asarray(point, np.float32),
            np.asarray(radius, np.float32))


CONTACT_BODY, CONTACT_POINT, CONTACT_RADIUS = _contact_tables()


# ---------------------------------------------------------------------------
# Augmented FK: body poses + per-DOF world axes/anchors
# ---------------------------------------------------------------------------


class DynFK(NamedTuple):
    body_pos: jnp.ndarray    # (NB, 3) body-frame origins, world
    body_quat: jnp.ndarray   # (NB, 4)
    com_w: jnp.ndarray       # (NB, 3) body COMs, world
    dof_axis: jnp.ndarray    # (NJ, 3) hinge axes, world
    dof_anchor: jnp.ndarray  # (NJ, 3) hinge anchor points, world


def fk_dynamics(qpos: jnp.ndarray) -> DynFK:
    """Single-sample (35,) augmented FK. Hinges fold in declaration order;
    hinge k's world axis/anchor account for the preceding hinges of the
    same body (kinematics.py:97-117 transform convention)."""
    root_pos = qpos[0:3]
    root_quat = qpos[3:7]
    root_quat = root_quat / jnp.linalg.norm(root_quat)

    pos = [None] * NB
    quat = [None] * NB
    pos[0], quat[0] = root_pos, root_quat
    axes, anchors = [], []

    for bi, b in enumerate(BODIES[1:], start=1):
        sl = QPOS_JOINT_SLICES[b.name]
        angles = qpos[sl]
        parent = BODY_INDEX[b.parent]
        offset = jnp.asarray(b.offset, qpos.dtype)
        q_local = jnp.asarray([1.0, 0.0, 0.0, 0.0], qpos.dtype)
        t_local = jnp.zeros((3,), qpos.dtype)
        for k, hinge in enumerate(b.joints):
            a_k = jnp.asarray(hinge.axis, qpos.dtype)
            p_k = jnp.asarray(hinge.pos, qpos.dtype)
            # world axis/anchor BEFORE applying this hinge's rotation
            axes.append(quat_rotate(quat[parent], quat_rotate(q_local, a_k)))
            anchors.append(
                pos[parent]
                + quat_rotate(quat[parent],
                              offset + t_local + quat_rotate(q_local, p_k))
            )
            qk = quat_from_axis_angle(a_k, angles[k])
            tk = p_k - quat_rotate(qk, p_k)
            t_local = t_local + quat_rotate(q_local, tk)
            q_local = quat_mul(q_local, qk)
        pos[bi] = pos[parent] + quat_rotate(quat[parent], offset + t_local)
        quat[bi] = quat_mul(quat[parent], q_local)

    body_pos = jnp.stack(pos)
    body_quat = jnp.stack(quat)
    com_w = body_pos + quat_rotate(body_quat, jnp.asarray(BODY_COM, qpos.dtype))
    return DynFK(body_pos, body_quat, com_w,
                 jnp.stack(axes), jnp.stack(anchors))


def body_jacobians(fk: DynFK):
    """COM Jacobians for every body: Jv (NB, 3, NV), Jw (NB, 3, NV).

    Free root: translation columns are the world basis; rotation columns
    are the root rotation matrix columns (BODY-frame angular velocity,
    MuJoCo free-joint convention). Hinge j contributes n_j (angular) and
    n_j x (com_b - anchor_j) (linear) to every descendant body."""
    dtype = fk.body_pos.dtype
    R_root = quat_rotate(
        fk.body_quat[0][None, :], jnp.eye(3, dtype=dtype)
    )                                            # rows = world images of e_k
    R_cols = R_root                              # (3 cols as rows)

    mask = jnp.asarray(ANCESTOR_MASK, dtype)     # (NB, NJ)
    # hinge part
    n = fk.dof_axis                              # (NJ, 3)
    rel = fk.com_w[:, None, :] - fk.dof_anchor[None, :, :]     # (NB, NJ, 3)
    jv_h = jnp.cross(n[None], rel) * mask[..., None]           # (NB, NJ, 3)
    jw_h = jnp.broadcast_to(n[None], (NB, NJ, 3)) * mask[..., None]
    # root part
    rel0 = fk.com_w - fk.body_pos[0]                           # (NB, 3)
    jv_rt = jnp.broadcast_to(jnp.eye(3, dtype=dtype)[None], (NB, 3, 3))
    jv_rr = jnp.cross(R_cols[None], rel0[:, None, :])          # (NB, 3, 3)
    jw_rr = jnp.broadcast_to(R_cols[None], (NB, 3, 3))
    Jv = jnp.concatenate(
        [jv_rt, jv_rr, jv_h], axis=1).transpose(0, 2, 1)       # (NB, 3, NV)
    Jw = jnp.concatenate(
        [jnp.zeros((NB, 3, 3), dtype), jw_rr, jw_h], axis=1
    ).transpose(0, 2, 1)
    return Jv, Jw


def mass_matrix(fk: DynFK) -> jnp.ndarray:
    """(NV, NV) joint-space inertia: CRB quadratic form + armature.

    Forces true-f32 contractions: TPU matmuls/einsums default to bf16 MXU
    passes, and a bf16-rounded mass matrix loses positive-definiteness —
    the downstream Cholesky NaNs on most instances (measured: 3256/4096
    after one control step). Same guard on bias/contact/forward_dynamics."""
    with jax.default_matmul_precision("highest"):
        dtype = fk.body_pos.dtype
        Jv, Jw = body_jacobians(fk)
        m = jnp.asarray(BODY_MASS, dtype)
        R = _quat_to_mat(fk.body_quat)                         # (NB, 3, 3)
        I_w = R @ jnp.asarray(BODY_INERTIA, dtype) @ R.transpose(0, 2, 1)
        M = jnp.einsum("biv,b,biw->vw", Jv, m, Jv)
        M = M + jnp.einsum("biv,bij,bjw->vw", Jw, I_w, Jw)
        arm = jnp.concatenate(
            [jnp.zeros((6,), dtype), jnp.full((NJ,), JOINT_ARMATURE, dtype)]
        )
        return M + jnp.diag(arm)


def _quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz -> (..., 3, 3)."""
    basis = jnp.eye(3, dtype=q.dtype)
    cols = jnp.stack(
        [quat_rotate(q, jnp.broadcast_to(basis[i], q.shape[:-1] + (3,)))
         for i in range(3)], axis=-1,
    )
    return cols


# ---------------------------------------------------------------------------
# Position integration (exponential map) and bias forces via nested jvp
# ---------------------------------------------------------------------------


def integrate_qpos(qpos: jnp.ndarray, qvel: jnp.ndarray, dt) -> jnp.ndarray:
    """Advance positions along velocities for time dt: root translation is
    linear, the root quaternion moves on the exponential map of the
    BODY-frame angular velocity (right multiplication), hinges are linear."""
    root_pos = qpos[..., 0:3] + dt * qvel[..., 0:3]
    w = qvel[..., 3:6]
    n2 = (w * w).sum(-1, keepdims=True)
    safe = jnp.where(n2 > 1e-16, n2, 1.0)
    norm = jnp.sqrt(safe)
    half = 0.5 * dt * norm
    # sin(half)/norm, series-safe at |w| -> 0 (avoids NaN grads)
    k = jnp.where(n2 > 1e-16, jnp.sin(half) / norm, 0.5 * dt)
    dq = jnp.concatenate([jnp.cos(half), k * w], axis=-1)
    quat = quat_mul(qpos[..., 3:7], dq)
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    joints = qpos[..., 7:] + dt * qvel[..., 6:]
    return jnp.concatenate([root_pos, quat, joints], axis=-1)


def _quat_conj(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], q.dtype)


def bias_forces(qpos: jnp.ndarray, qvel: jnp.ndarray,
                fk0: "DynFK | None" = None, JvJw=None) -> jnp.ndarray:
    """(NV,) generalized Coriolis/centrifugal + gravity forces c(q, qv)
    (MuJoCo's qfrc_bias sign convention: M qacc = tau - c).

    Body COM velocity/acceleration and angular velocity/acceleration along
    the exact qacc=0 trajectory come from nested jvp of the position
    kinematics in time — no hand-derived velocity-product terms.

    True-f32 contractions (see mass_matrix)."""

    one = jnp.ones((), qpos.dtype)

    def kin(dt):
        fk = fk_dynamics(integrate_qpos(qpos, qvel, dt))
        return fk.com_w, fk.body_quat

    def vel(dt):
        (c, q), (dc, dq) = jax.jvp(kin, (dt,), (one,))
        # world angular velocity from qdot: w = 2 * vec(qdot x q*)
        w = 2.0 * quat_mul(dq, _quat_conj(q))[..., 1:]
        return c, q, dc, w

    (_, q0, v_com, w), (_, _, a_com, alpha) = jax.jvp(
        vel, (jnp.zeros((), qpos.dtype),), (one,)
    )

    with jax.default_matmul_precision("highest"):
        dtype = qpos.dtype
        m = jnp.asarray(BODY_MASS, dtype)
        R = _quat_to_mat(q0)
        I_w = R @ jnp.asarray(BODY_INERTIA, dtype) @ R.transpose(0, 2, 1)
        g = jnp.asarray([0.0, 0.0, -GRAVITY], dtype)
        F = m[:, None] * (a_com - g[None])                    # (NB, 3)
        Iw_w = jnp.einsum("bij,bj->bi", I_w, w)
        N = jnp.einsum("bij,bj->bi", I_w, alpha) + jnp.cross(w, Iw_w)

        # the caller (forward_dynamics) has usually already run the FK and
        # Jacobians for the mass matrix — reuse them instead of recomputing
        if fk0 is None:
            fk0 = fk_dynamics(qpos)
        Jv, Jw = JvJw if JvJw is not None else body_jacobians(fk0)
        return (jnp.einsum("biv,bi->v", Jv, F)
                + jnp.einsum("biv,bi->v", Jw, N))


# ---------------------------------------------------------------------------
# Passive forces, limits, contacts
# ---------------------------------------------------------------------------


def passive_forces(qpos: jnp.ndarray, qvel: jnp.ndarray) -> jnp.ndarray:
    """Hinge spring/damper from the XML defaults (stiffness 10 toward
    springref 0, damping 5; dp_env_v2.xml:4). Root is free."""
    tau_j = -JOINT_STIFFNESS * qpos[7:] - JOINT_DAMPING * qvel[6:]
    return jnp.concatenate([jnp.zeros((6,), qpos.dtype), tau_j])


def limit_forces(qpos: jnp.ndarray, qvel: jnp.ndarray,
                 k: float = 300.0, c: float = 3.0) -> jnp.ndarray:
    """Soft joint-limit penalty (MuJoCo enforces limits in its constraint
    solver; a stiff one-sided spring is the penalty analog)."""
    q = qpos[7:]
    over = jnp.maximum(q - jnp.asarray(LIMIT_HI, qpos.dtype), 0.0)
    under = jnp.maximum(jnp.asarray(LIMIT_LO, qpos.dtype) - q, 0.0)
    tau_j = -k * over + k * under - c * qvel[6:] * ((over > 0) | (under > 0))
    return jnp.concatenate([jnp.zeros((6,), qpos.dtype), tau_j])


def _skew(r: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    z = jnp.zeros_like(r[..., 0])
    return jnp.stack([
        jnp.stack([z, -r[..., 2], r[..., 1]], -1),
        jnp.stack([r[..., 2], z, -r[..., 0]], -1),
        jnp.stack([-r[..., 1], r[..., 0], z], -1),
    ], -2)


# static one-hot (NB, NC) point->body aggregation matrix: per-body moment
# sums become one small matmul (TPU-friendly) instead of scatter-adds
_CONTACT_ONEHOT = np.zeros((NB, len(CONTACT_BODY)), np.float32)
_CONTACT_ONEHOT[CONTACT_BODY, np.arange(len(CONTACT_BODY))] = 1.0


def contact_terms(
    fk: DynFK, Jv: jnp.ndarray, Jw: jnp.ndarray, qvel: jnp.ndarray,
    stiffness: float = 30000.0, damping: float = 1000.0,
    mu: float = FLOOR_FRICTION, v_reg: float = 5e-3,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Penalty ground contacts at the static support points.

    Normal: one-sided spring-damper on penetration depth; tangential:
    viscous-in-Coulomb-cone friction, coefficient mu*f_n/|v_t| (regularized).
    Both damping-like parts are returned as a velocity-coupling matrix
    J^T W J so the integrator can treat them IMPLICITLY — penalty contact
    damping/friction at these magnitudes is explicit-unstable at any usable
    substep, the same reason MuJoCo's Euler integrates joint damping
    implicitly.

    TPU layout note: the point Jacobians Jp = Jv_b - [r]x Jw_b are NEVER
    materialized. Per-point (NC, 3, NV) tensors tile-pad 3->8 sublanes and
    NV=34->128 lanes under vmap (~9x HBM traffic, measured 6.3 ms of a
    13.9 ms substep at batch 4096). Instead everything is aggregated to
    per-body 3x3 moments first (exact algebra, not an approximation):

      xdot_p   = v_b + w_b x r_p                 (body COM twist, gathered)
      tau_c    = sum_b [Jv_b^T F_b + Jw_b^T T_b],  F_b = sum f_p,
                                                   T_b = sum r_p x f_p
      JWJ      = sum_b G_b^T K_b G_b,  G_b = [Jv_b; Jw_b]  (6, NV),
                 K_b = [[A_b, -B_b], [-B_b^T, C_b]]  (6, 6) with
                 A_b = sum W_p,  B_b = sum W_p S_p,  C_b = sum S_p^T W_p S_p,
                 S_p = skew(r_p), W_p = diag(c_t, c_t, c_n).

    The largest intermediate is (NC, 3, 3); the final contractions have the
    same body-level shapes as the mass-matrix quadratic form.

    Returns (tau_c, JWJ): the explicit generalized contact force at the
    current velocity, and the (NV, NV) implicit damping coupling.
    True-f32 contractions (see mass_matrix)."""
    with jax.default_matmul_precision("highest"):
        dtype = fk.body_pos.dtype
        bidx = jnp.asarray(CONTACT_BODY)
        pts = jnp.asarray(CONTACT_POINT, dtype)
        rad = jnp.asarray(CONTACT_RADIUS, dtype)
        onehot = jnp.asarray(_CONTACT_ONEHOT, dtype)               # (NB, NC)

        x = fk.body_pos[bidx] + quat_rotate(fk.body_quat[bidx], pts)
        r = x - fk.com_w[bidx]                                     # (NC, 3)

        # body COM twist -> per-point velocity (no Jp): xdot = v_b + w_b x r
        v_b = jnp.einsum("bav,v->ba", Jv, qvel)                    # (NB, 3)
        w_b = jnp.einsum("bav,v->ba", Jw, qvel)
        xdot = v_b[bidx] + jnp.cross(w_b[bidx], r)                 # (NC, 3)

        depth = rad - x[:, 2]                                      # >0: contact
        active = (depth > 0.0).astype(dtype)
        fn_spring = stiffness * depth * active
        fn = jnp.maximum(fn_spring - damping * xdot[:, 2] * active, 0.0)
        vt = xdot[:, 0:2]
        vt_norm = jnp.sqrt((vt * vt).sum(-1) + v_reg * v_reg)
        c_t = mu * fn / vt_norm                                    # (NC,)
        ft = -c_t[:, None] * vt
        f = jnp.concatenate([ft, fn[:, None]], axis=-1)            # (NC, 3)

        # force/torque resultants per body: F_b = sum f, T_b = sum r x f
        F = onehot @ f                                             # (NB, 3)
        T = onehot @ jnp.cross(r, f)
        tau_c = (jnp.einsum("bav,ba->v", Jv, F)
                 + jnp.einsum("bav,ba->v", Jw, T))

        # per-point world-frame diag(c_t, c_t, c_n) -> body moment matrices
        W = jnp.stack([c_t, c_t, damping * active], axis=-1)       # (NC, 3)
        S = _skew(r)                                               # (NC, 3, 3)
        WS = W[:, :, None] * S                                     # diag(W) S
        STWS = jnp.einsum("pij,pik->pjk", S, WS)                   # S^T W S
        A = jnp.einsum("bp,pi->bi", onehot, W)                     # (NB, 3)
        B = (onehot @ WS.reshape(-1, 9)).reshape(NB, 3, 3)
        C = (onehot @ STWS.reshape(-1, 9)).reshape(NB, 3, 3)
        K = jnp.concatenate([
            jnp.concatenate([_diag3(A), -B], axis=-1),
            jnp.concatenate([-B.transpose(0, 2, 1), C], axis=-1),
        ], axis=-2)                                                # (NB, 6, 6)
        G = jnp.concatenate([Jv, Jw], axis=1)                      # (NB, 6, NV)
        JWJ = jnp.einsum("biv,bij,bjw->vw", G, K, G)
        return tau_c, JWJ


def _diag3(d: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) diagonal embedding."""
    return d[..., :, None] * jnp.eye(3, dtype=d.dtype)


# ---------------------------------------------------------------------------
# Forward dynamics + stepping
# ---------------------------------------------------------------------------


def forward_dynamics(
    qpos: jnp.ndarray, qvel: jnp.ndarray, tau: jnp.ndarray,
    *, contacts: bool = True, limits: bool = True,
    h_implicit: float = 0.0, kd_extra: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """qacc (NV,) = (M + h*D)^-1 (tau + passive + limits + contacts - bias).

    `tau` is the (NV,) applied generalized force (root rows usually 0).
    With h_implicit > 0 all damping-like forces (joint damping, the PD's kd
    given via kd_extra, contact damping and friction) are integrated
    implicitly: they appear explicitly in the rhs AND as h*D on the solve
    matrix, which is the backward-Euler update for the velocity-linear part
    (MuJoCo's Euler does the same for joint damping). With h_implicit = 0
    this is the exact continuous forward dynamics (used by the MuJoCo
    parity tests). True-f32 contractions (see mass_matrix)."""
    fk = fk_dynamics(qpos)
    Jv, Jw = body_jacobians(fk)
    dtype = qpos.dtype
    with jax.default_matmul_precision("highest"):
        m = jnp.asarray(BODY_MASS, dtype)
        R = _quat_to_mat(fk.body_quat)
        I_w = R @ jnp.asarray(BODY_INERTIA, dtype) @ R.transpose(0, 2, 1)
        M = jnp.einsum("biv,b,biw->vw", Jv, m, Jv)
        M = M + jnp.einsum("biv,bij,bjw->vw", Jw, I_w, Jw)
    M = M + jnp.diag(jnp.concatenate(
        [jnp.zeros((6,), dtype), jnp.full((NJ,), JOINT_ARMATURE, dtype)]
    ))

    rhs = tau + passive_forces(qpos, qvel) - bias_forces(
        qpos, qvel, fk0=fk, JvJw=(Jv, Jw))
    if limits:
        rhs = rhs + limit_forces(qpos, qvel)
    D_joint = jnp.full((NJ,), JOINT_DAMPING, dtype)
    if kd_extra is not None:
        D_joint = D_joint + kd_extra
    D = jnp.diag(jnp.concatenate([jnp.zeros((6,), dtype), D_joint]))
    if contacts:
        tau_c, JWJ = contact_terms(fk, Jv, Jw, qvel)
        rhs = rhs + tau_c
        D = D + JWJ

    M_solve = M + h_implicit * D
    return spd_solve_unrolled(M_solve, rhs)


def spd_solve_unrolled(M: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve the SPD system M x = b by a Cholesky factorization whose NV
    column steps are unrolled at TRACE time (static Python loop).

    XLA:TPU lowers `cho_factor` to a Cholesky custom call that costs
    ~15 ms at batch 4096 x (34, 34) — 56% of a whole dynamics substep
    (profiled round 2). The same factorization written as 34 static
    rank-1 updates fuses into ordinary batched elementwise ops under
    vmap and runs ~20x faster at this tiny-matrix / huge-batch shape.

    The forward substitution comes for free: factoring the augmented
    matrix [[M, b], [b^T, *]] puts y = L^-1 b in the last row of the
    augmented Cholesky factor. Only the (also unrolled) backward
    substitution L^T x = y remains.
    """
    n = M.shape[-1]
    dtype = M.dtype
    # augmented SPD-ish matrix; the trailing diagonal entry only needs to
    # keep the rsqrt finite (its column is never used)
    A = jnp.concatenate([M, b[:, None]], axis=1)
    A = jnp.concatenate(
        [A, jnp.concatenate([b, jnp.ones((1,), dtype)])[None, :]], axis=0
    )
    cols = []
    for j in range(n):
        c = A[:, 0]
        d = jax.lax.rsqrt(c[0])
        c = c * d                                  # Cholesky column j
        cols.append(c)
        A = A[1:, 1:] - c[1:, None] * c[None, 1:]  # trailing Schur update
    # cols[j] is (n + 1 - j,): entries [0] = L[j, j], [1:] = L[j+1:, j]
    # with the LAST entry L_aug[n, j] = y[j] (y solves L y = b)
    y = jnp.stack([c[-1] for c in cols])
    # backward substitution L^T x = y, unrolled; xs built from the bottom
    xs = [None] * n
    for i in reversed(range(n)):
        acc = y[i]
        if i < n - 1:
            # L[i+1:, i] is cols[i][1:-1]
            acc = acc - jnp.dot(cols[i][1:-1], jnp.stack(xs[i + 1:]))
        xs[i] = acc / cols[i][0]
    return jnp.stack(xs)


def step_physics(
    qpos: jnp.ndarray, qvel: jnp.ndarray, tau: jnp.ndarray, h: float,
    *, contacts: bool = True, limits: bool = True,
    kd_extra: jnp.ndarray | None = None,
):
    """One implicitly-damped semi-implicit Euler substep (velocity update
    first, then positions integrate with the NEW velocity — MuJoCo's Euler
    scheme)."""
    qacc = forward_dynamics(
        qpos, qvel, tau, contacts=contacts, limits=limits,
        h_implicit=h, kd_extra=kd_extra,
    )
    qvel = qvel + h * qacc
    qpos = integrate_qpos(qpos, qvel, h)
    return qpos, qvel


def pd_torques(qpos: jnp.ndarray, qvel: jnp.ndarray,
               target_qpos: jnp.ndarray, kp_scale: float = 1.0,
               kd_scale: float = 1.0) -> jnp.ndarray:
    """DeepMimic joint-space PD toward a target pose (PARAMS_KP_KD,
    mocap_util.py:22-25); root rows zero (unactuated free joint)."""
    kp = jnp.asarray(PD_KP, qpos.dtype) * kp_scale
    kd = jnp.asarray(PD_KD, qpos.dtype) * kd_scale
    tau_j = kp * (target_qpos[..., 7:] - qpos[..., 7:]) - kd * qvel[..., 6:]
    zeros = jnp.zeros(qpos.shape[:-1] + (6,), qpos.dtype)
    return jnp.concatenate([zeros, tau_j], axis=-1)


class DynamicsEnv:
    """Vectorized forward-dynamics environment: N instances stepped in
    lockstep under jit, DeepMimic PD actuation toward a target pose.

    Replaces round-1's PDPhysicsEnv (which integrated joint coordinates
    against a scalar inertia and never rotated the root). dt is the 30 Hz
    control interval of the mocap clips; substeps at h = dt/substeps ~= the
    reference integrator timestep 0.002 (dp_env_v2.xml:9).

    `layout` selects the batching strategy:
      - "aba" (default): O(n) Featherstone — world-frame RNEA bias + a
        zero-velocity articulated-body solve — in env-last layout
        (dynamics_aba.py). Removes the Jacobians, the CRB mass matrix,
        the nested-jvp bias replays and the 34x34 Cholesky that made the
        dense substep materialization-bound (the round-2 roofline note).
      - "vmap": dense engine, env axis leading via jax.vmap over the
        single-env functions (the MuJoCo-parity reference path).
      - "lanes": the dense engine in env-last structure-of-arrays
        (dynamics_lanes.py); measured equivalent to vmap on v5e (the
        dense substep is bound by materialized intermediates between
        fusions, not tile padding).
      - "pallas": the whole control step (all substeps, PD + FK + RNEA +
        ABA + contacts + integration) as ONE Pallas TPU kernel with every
        intermediate resident in VMEM (dynamics_pallas.py) — removes the
        fusion-boundary HBM traffic and per-kernel dispatch that bound the
        "aba" path. TPU-targeted: on other backends it falls back to
        interpret mode, whose ~15k-op body takes XLA:CPU many minutes to
        compile — use it there only for tiny one-off verification.
    All are the same math; parity is tested to ~1e-9 in f64, and the
    vmap path is machine-exact against MuJoCo mj_forward/mj_step."""

    def __init__(self, dt: float = 1.0 / 30.0, substeps: int = 17,
                 kp_scale: float = 1.0, kd_scale: float = 1.0,
                 contacts: bool = True, limits: bool = True,
                 layout: str = "auto"):
        if layout == "auto":
            # the Pallas whole-control-step kernel is the measured winner on
            # TPU (5.2M env-steps/s vs 44.5k aba at N=65536/4096, identical
            # rewards); on CPU the Mosaic path doesn't exist and interpret
            # mode is impractical, so fall back to the O(n) engine
            layout = "pallas" if jax.default_backend() == "tpu" else "aba"
        if layout not in ("aba", "lanes", "vmap", "pallas"):
            raise ValueError(layout)
        self.dt = dt
        self.substeps = substeps
        self.h = dt / substeps
        self.kp_scale = kp_scale
        self.kd_scale = kd_scale
        self.contacts = contacts
        self.limits = limits
        self.layout = layout

    @partial(jax.jit, static_argnums=0)
    def step(self, qpos, qvel, target_qpos):
        """(N, 35), (N, 34), (N, 35) -> stepped (qpos, qvel). PD torques are
        recomputed every substep against the fixed target."""
        kd = jnp.asarray(PD_KD, qpos.dtype) * self.kd_scale

        if self.layout == "pallas":
            from .dynamics_pallas import control_step_pallas

            return control_step_pallas(
                qpos, qvel, target_qpos, h=self.h, substeps=self.substeps,
                kp_scale=self.kp_scale, kd_scale=self.kd_scale,
                contacts=self.contacts, limits=self.limits,
                interpret=jax.default_backend() != "tpu",
            )

        if self.layout in ("lanes", "aba"):
            from . import dynamics_lanes as DL

            if self.layout == "aba":
                from .dynamics_aba import step_physics_aba as step_T
            else:
                step_T = DL.step_physics_lanes

            tgt_T = target_qpos.T

            def sub_l(carry, _):
                qp_T, qv_T = carry
                tau_T = DL.pd_torques_lanes(
                    qp_T, qv_T, tgt_T, self.kp_scale, self.kd_scale)
                qp_T, qv_T = step_T(
                    qp_T, qv_T, tau_T, self.h, contacts=self.contacts,
                    limits=self.limits, kd_extra=kd,
                )
                return (qp_T, qv_T), None

            (qp_T, qv_T), _ = jax.lax.scan(
                sub_l, (qpos.T, qvel.T), None, length=self.substeps
            )
            return qp_T.T, qv_T.T

        def sub(carry, _):
            qp, qv = carry
            tau = pd_torques(qp, qv, target_qpos, self.kp_scale, self.kd_scale)
            qp, qv = jax.vmap(
                lambda a, b, c: step_physics(
                    a, b, c, self.h, contacts=self.contacts,
                    limits=self.limits, kd_extra=kd,
                )
            )(qp, qv, tau)
            return (qp, qv), None

        (qpos, qvel), _ = jax.lax.scan(
            sub, (qpos, qvel), None, length=self.substeps
        )
        return qpos, qvel
