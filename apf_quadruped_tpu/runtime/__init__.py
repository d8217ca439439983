"""Closed-loop orchestration, scenario sweeps, and metrics (the roslaunch /
ROS-graph replacement)."""

from . import loop  # noqa: F401
