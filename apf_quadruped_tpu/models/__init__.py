"""Robot models: constants, leg kinematics, and single-rigid-body dynamics."""
