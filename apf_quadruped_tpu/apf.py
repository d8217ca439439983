"""Artificial-potential-field navigation + slippage robustness index (L6).

Re-derivation of the reference's APF layer, which is inlined in the control
loop (reference main.cpp): per-foot goals (main.cpp:1171-1174), saturated
attractive errors + adaptive gains (compute_Kpa, main.cpp:2803-2845),
slippage-driven repulsive fields (main.cpp:1283-1296), the friction-cone
robustness index with its stance-integral and EWMA (main.cpp:1515-1565,
1273-1277), the combined left/right asymmetry index (compute_fr,
main.cpp:2745-2754), gait adaptation (fake-crawl threshold 0.34,
main.cpp:1320-1329), and the CoM step saturation (saturate_xstep,
main.cpp:2767-2789).

Everything here is elementwise over (.., 4)-shaped per-foot arrays —
trivially vmappable over scenarios and jit-safe (branch-free via where/clip).
Carried state lives in ApfState (a pytree), matching the reference's
globals (rob_foot_*, h_*_prev, period_st).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .config import ApfConfig, RobotConfig
from .models.dogbot import LEG_SIGNS

THETA = jnp.arctan(0.5)   # friction-cone half angle, main.cpp:1519

# robot=None fallback stance offsets come from the RobotConfig defaults
# (single source of truth; dogbot_model.h:55-81)
_DEFAULT_STANCE = (RobotConfig.stance_x, RobotConfig.stance_y)


class ApfState(NamedTuple):
    """Per-scenario navigation state carried across replan cycles."""

    rob_foot: jnp.ndarray    # (.., 4) EWMA robustness per foot
    h_int: jnp.ndarray       # (.., 4) running margin integral (h_*_prev)
    period_st: jnp.ndarray   # (..,) accumulated stance-tracking time


def init_state(batch=(), dtype=jnp.float32) -> ApfState:
    """Matches the reference's init h_*_prev = period_st = 0.01
    (main.cpp:352, 444) so the first EWMA sees margin 1."""
    return ApfState(
        rob_foot=jnp.zeros(batch + (4,), dtype),
        h_int=jnp.full(batch + (4,), 0.01, dtype),
        period_st=jnp.full(batch, 0.01, dtype))


def cone_margin(forces_w: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Friction-cone margin angle  theta - alpha,  alpha = acos(f_z/|f|).

    forces_w: (.., 4, 3) world contact forces.  The reference's h = 1/(theta
    - alpha) (main.cpp:1525-1528); the integrand it accumulates is 1/h =
    theta - alpha (main.cpp:1536-1565).  Zero-force feet give alpha = acos(0
    /0) = NaN upstream; here they produce margin 0 (excluded by the > 0.01
    gate like the reference's isnan guard).
    """
    fz = forces_w[..., 2]
    fn = jnp.linalg.norm(forces_w, axis=-1)
    cosa = jnp.where(fn > eps, fz / jnp.maximum(fn, eps), 0.0)
    alpha = jnp.arccos(jnp.clip(cosa, -1.0, 1.0))
    return jnp.where(fn > eps, THETA - alpha, 0.0)


def accumulate_margin(cfg: ApfConfig, state: ApfState, forces_w, dt):
    """One tracking-tick update of the margin integral + stance clock
    (the h_*_prev += dt * (1/h) lines, main.cpp:1536-1565, and
    period_st accumulation, main.cpp:1696)."""
    m = cone_margin(forces_w)
    gate = m > cfg.rob_floor
    return state._replace(
        h_int=state.h_int + jnp.where(gate, m, 0.0) * dt[..., None],
        period_st=state.period_st + dt)


def update_robustness(cfg: ApfConfig, state: ApfState) -> ApfState:
    """Per-replan EWMA update + integrator reset (main.cpp:1273-1276,
    1445-1453): rob = 0.35 rob + 0.65 * h_int / period_st."""
    rob = (cfg.ewma_old * state.rob_foot
           + cfg.ewma_new * state.h_int / state.period_st[..., None])
    return ApfState(rob_foot=rob,
                    h_int=jnp.zeros_like(state.h_int),
                    period_st=jnp.zeros_like(state.period_st))


def combined_asymmetry(cfg: ApfConfig, rob_foot) -> jnp.ndarray:
    """comb_rob: deadbanded left/right + front/back robustness asymmetry
    (main.cpp:1277, compute_fr 2745-2754).  Leg order (BR, BL, FL, FR)."""
    br, bl, fl, fr = (rob_foot[..., 0], rob_foot[..., 1],
                      rob_foot[..., 2], rob_foot[..., 3])

    def fr_db(v):
        a = jnp.abs(v)
        return jnp.where(a < cfg.comb_deadband, 0.0, a)

    return (fr_db(br - bl) + fr_db(fr - fl)
            + fr_db(jnp.abs(br - fr)) + fr_db(jnp.abs(bl - fl)))


def foot_goals(target_xy, robot=None) -> jnp.ndarray:
    """(.., 4, 2) per-foot goals = target +- nominal stance offsets
    (main.cpp:1171-1174).  robot: optional RobotConfig; defaults to
    DogBot's stance (dogbot_model.h:55-81)."""
    sx, sy = ((robot.stance_x, robot.stance_y) if robot is not None
              else _DEFAULT_STANCE)
    off = jnp.asarray(LEG_SIGNS, target_xy.dtype) * jnp.asarray(
        [sx, sy], target_xy.dtype)
    return target_xy[..., None, :] + off


def attractive_gain(cfg: ApfConfig, e_a, fake_crawl) -> jnp.ndarray:
    """(.., 4, 2) adaptive diagonal K_pa per foot (compute_Kpa,
    main.cpp:2803-2845): fake-crawl slows everything to 0.01; MIN_EXIT
    lowers the far-field gain."""
    near = jnp.abs(e_a) < cfg.e_near_threshold          # (.., 4, 2)
    kx_near, kx_far = cfg.kpa_x_near, (
        cfg.kpa_x_far_minexit if cfg.min_exit else cfg.kpa_x_far)
    ky_near, ky_far = cfg.kpa_y_near, (
        cfg.kpa_y_far_minexit if cfg.min_exit else cfg.kpa_y_far)
    k_near = jnp.stack([jnp.full_like(e_a[..., 0], kx_near),
                        jnp.full_like(e_a[..., 1], ky_near)], axis=-1)
    k_far = jnp.stack([jnp.full_like(e_a[..., 0], kx_far),
                       jnp.full_like(e_a[..., 1], ky_far)], axis=-1)
    k = jnp.where(near, k_near, k_far)
    kc = jnp.stack([jnp.full_like(e_a[..., 0], cfg.kpa_x_crawl),
                    jnp.full_like(e_a[..., 1], cfg.kpa_y_crawl)], axis=-1)
    if cfg.min_exit:
        # under MIN_EXIT the lowered far-field gain wins over fake-crawl
        # (compute_Kpa's else-branches, main.cpp:2814-2816, 2832-2833)
        kc = jnp.where(near, kc, k_far)
    return jnp.where(fake_crawl[..., None, None], kc, k)


def repulsive_versors(dtype=jnp.float32, robot=None) -> jnp.ndarray:
    """(4, 2) outward unit vectors body-center -> nominal foot
    (the reference's *_versor, main.cpp:440-458)."""
    sx, sy = ((robot.stance_x, robot.stance_y) if robot is not None
              else _DEFAULT_STANCE)
    v = jnp.asarray(LEG_SIGNS, dtype) * jnp.asarray([sx, sy], dtype)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


class ApfOutput(NamedTuple):
    f_att: jnp.ndarray       # (.., 4, 2) attractive field per foot
    f_rep: jnp.ndarray       # (.., 4, 2) repulsive field per foot
    step_targets: jnp.ndarray  # (.., 4, 2) desired foot xy (p + 0.5 f)
    com_des: jnp.ndarray     # (.., 2) step-saturated CoM goal
    fake_crawl: jnp.ndarray  # (..,) bool — slow-gait flag
    rob_mean: jnp.ndarray    # (..,) mean robustness (the 0.34 test input)
    comb_rob: jnp.ndarray    # (..,)


def navigate(cfg: ApfConfig, state: ApfState, feet_xy, com_xy,
             target_xy, robot=None) -> ApfOutput:
    """One replan-cycle APF evaluation (the navigation block of ctrl_loop,
    main.cpp:1171-1422).

    feet_xy: (.., 4, 2) current world foot xy, com_xy: (.., 2),
    target_xy: (.., 2) user goal.  state must already hold the EWMA'd
    rob_foot (call update_robustness first).

    robot: optional RobotConfig.  When given, step targets are clamped to
    the kinematic range-of-motion box nominal_stance +- max_dev around the
    saturated CoM goal — the towr RangeOfMotionConstraint's role
    (reference src/towr/range_of_motion_constraint.cc:60-84, max_dev
    (0.1, 0.15, 0.06) at include/towr/models/examples/dogbot_model.h:80).
    Without it an aggressive target or large repulsive field can command
    footholds the 3-DoF legs cannot reach.
    """
    rob = state.rob_foot
    rob_mean = jnp.mean(rob, axis=-1)
    fake_crawl = rob_mean < cfg.crawl_threshold         # main.cpp:1320
    comb = combined_asymmetry(cfg, rob)

    goals = foot_goals(target_xy, robot)
    e_a = jnp.clip(feet_xy - goals, -cfg.err_sat, cfg.err_sat)
    k = attractive_gain(cfg, e_a, fake_crawl)
    f_att = -k * e_a

    vers = repulsive_versors(feet_xy.dtype, robot)
    lat = jnp.asarray([1.0, 0.0], feet_xy.dtype)        # lateral escape dir
    if cfg.min_exit:
        f_rep = (cfg.rep_gain_minexit * rob[..., None] * vers
                 + cfg.lat_gain_minexit * comb[..., None, None] * lat)
    else:
        f_rep = cfg.rep_gain * rob[..., None] * vers

    f_step = f_att + (f_rep if cfg.rep_field_in_step else 0.0)
    step_targets = feet_xy + cfg.step_gain * f_step
    if cfg.step_reach > 0.0:
        # per-cycle foot step-length limit (see ApfConfig.step_reach)
        step_targets = feet_xy + jnp.clip(step_targets - feet_xy,
                                          -cfg.step_reach, cfg.step_reach)

    com_raw = jnp.mean(step_targets, axis=-2)           # main.cpp:1409
    d = com_raw - com_xy
    com_des = com_xy + jnp.clip(d, -cfg.step_sat, cfg.step_sat)

    if robot is not None:
        off = jnp.asarray(LEG_SIGNS, feet_xy.dtype) * jnp.asarray(
            [robot.stance_x, robot.stance_y], feet_xy.dtype)
        nominal = com_des[..., None, :] + off            # (.., 4, 2)
        dev = jnp.asarray(robot.max_dev[:2], feet_xy.dtype)
        step_targets = jnp.clip(step_targets, nominal - dev, nominal + dev)

    return ApfOutput(f_att=f_att, f_rep=f_rep, step_targets=step_targets,
                     com_des=com_des, fake_crawl=fake_crawl,
                     rob_mean=rob_mean, comb_rob=comb)
