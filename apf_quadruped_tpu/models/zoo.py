"""Robot model zoo for the SRB MPC layer (towr's example model family).

Transcribed from the reference's towr model headers
(include/towr/models/examples/{anymal,hyq,biped,monoped}_model.h — mass,
base inertia, nominal stance, max deviation).  The MPC planner is
robot-agnostic given (mass, inertia, footholds, contact schedule); robots
with fewer than four end-effectors pad to the fixed 4-slot layout with
permanently-masked feet, so every model runs through the same jit program
(shape-static, like everything else here).

Axis convention: this package uses +y forward / +x lateral
(models/dogbot.py); towr's examples use +x forward, so their stances are
rotated into ours (x_towr -> y, y_towr -> -x).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np


class SrbModel(NamedTuple):
    name: str
    mass: float
    inertia: Tuple[float, ...]         # (Ixx, Iyy, Izz, Ixy, Ixz, Iyz)
    nominal_stance: np.ndarray         # (4, 3) base frame, padded
    foot_mask: np.ndarray              # (4,) 1.0 = real end-effector
    max_dev: Tuple[float, float, float]
    com_height: float


def _quad_stance(x_fwd, y_lat, z):
    """towr LF/RF/LH/RH stance -> our (BR, BL, FL, FR) order and axes."""
    # our frame: x lateral (right +), y forward
    return np.array([
        [+y_lat, -x_fwd, z],   # BR  (towr RH)
        [-y_lat, -x_fwd, z],   # BL  (towr LH)
        [-y_lat, +x_fwd, z],   # FL  (towr LF)
        [+y_lat, +x_fwd, z],   # FR  (towr RF)
    ])


def _rot_inertia_xy(i6):
    """Rotate an inertia tuple by 90deg about z (towr x-forward -> our
    y-forward): Ixx <-> Iyy, Ixy -> -Ixy(sym), Ixz <-> -Iyz."""
    ixx, iyy, izz, ixy, ixz, iyz = i6
    return (iyy, ixx, izz, -ixy, -iyz, ixz)


def anymal() -> SrbModel:
    """ANYmal (anymal_model.h: 29.5 kg, stance (0.34, 0.19, -0.42))."""
    return SrbModel(
        name="anymal", mass=29.5,
        inertia=_rot_inertia_xy((0.946438, 1.94478, 2.01835, 0.000938112,
                                 -0.00595386, -0.00146328)),
        nominal_stance=_quad_stance(0.34, 0.19, -0.42),
        foot_mask=np.ones(4), max_dev=(0.1, 0.15, 0.10), com_height=0.42)


def hyq() -> SrbModel:
    """HyQ (hyq_model.h: 83 kg, stance (0.31, 0.29, -0.58))."""
    return SrbModel(
        name="hyq", mass=83.0,
        inertia=_rot_inertia_xy((4.26, 8.97, 9.88, -0.0063, 0.193, 0.0126)),
        nominal_stance=_quad_stance(0.31, 0.29, -0.58),
        foot_mask=np.ones(4), max_dev=(0.20, 0.25, 0.10), com_height=0.58)


def dogbot() -> SrbModel:
    """DogBot (dogbot_model.h; native convention, no rotation needed)."""
    return SrbModel(
        name="dogbot", mass=21.261,
        inertia=(1.6375, 0.7098, 2.0399, -0.000291252, -0.000179158,
                 0.0737803),
        nominal_stance=np.array([
            [+0.186571, -0.289186, -0.402],
            [-0.186571, -0.289186, -0.402],
            [-0.186571, +0.289186, -0.402],
            [+0.186571, +0.289186, -0.402]]),
        foot_mask=np.ones(4), max_dev=(0.1, 0.15, 0.06), com_height=0.4)


def biped() -> SrbModel:
    """Biped (biped_model.h: 20 kg, feet at y = +-0.20, z = -0.65);
    slots BR/BL used, front slots masked."""
    stance = np.zeros((4, 3))
    stance[0] = [+0.20, 0.0, -0.65]
    stance[1] = [-0.20, 0.0, -0.65]
    stance[2] = [-0.20, 0.3, -0.65]     # masked
    stance[3] = [+0.20, 0.3, -0.65]     # masked
    return SrbModel(
        name="biped", mass=20.0,
        inertia=_rot_inertia_xy((1.209, 5.583, 6.056, 0.005, -0.190,
                                 -0.012)),
        nominal_stance=stance, foot_mask=np.array([1.0, 1.0, 0.0, 0.0]),
        max_dev=(0.15, 0.25, 0.15), com_height=0.65)


def monoped() -> SrbModel:
    """Monoped hopper (monoped_model.h: 20 kg, foot at (0, 0, -0.58))."""
    stance = np.zeros((4, 3))
    stance[:, 2] = -0.58
    return SrbModel(
        name="monoped", mass=20.0,
        inertia=_rot_inertia_xy((1.2, 5.5, 6.0, 0.0, -0.2, -0.01)),
        nominal_stance=stance, foot_mask=np.array([1.0, 0.0, 0.0, 0.0]),
        max_dev=(0.15, 0.25, 0.2), com_height=0.58)


ZOO = {m().name: m for m in (dogbot, anymal, hyq, biped, monoped)}


def robot_config_for(model: SrbModel):
    """RobotConfig override carrying the model's SRB constants (kinematic
    leg parameters stay DogBot's — only the SRB MPC layer is
    robot-agnostic; whole-body layers need a leg chain model)."""
    from ..config import RobotConfig

    return RobotConfig(mass=model.mass, inertia=tuple(model.inertia),
                       com_height=model.com_height,
                       max_dev=tuple(model.max_dev))
