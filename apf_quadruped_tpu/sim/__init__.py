"""Pure-JAX simulation harness — the Gazebo replacement (L1).

terrain: spatial friction-coefficient maps (the "slippery patch" worlds of
dogbot_gazebo, reference DogBotV4/ROS/src/dogbot_gazebo/models + worlds).
physics: articulated 18-DoF floating-base dynamics with penalty contact.
disturbance: scheduled external pushes (the force_plugin replacement).
"""

from . import disturbance, physics, terrain  # noqa: F401
