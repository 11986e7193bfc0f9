"""vio360_tpu — TPU-native 360° visual-inertial odometry in JAX/XLA/Pallas.

A ground-up re-design of the capabilities of the C++ reference
``93won/360_visual_inertial_odometry`` (equirectangular monocular VIO:
KLT front end, essential-matrix bootstrap, sliding-window BA, IMU
preintegration + gravity/scale init) as a functional, fixed-shape,
batched JAX system:

- ``geometry``  — ERP camera model, SO(3)/SE(3), triangulation, essential matrix
- ``ops``       — Pallas/XLA kernels: image pyramid, Shi–Tomasi, pyramidal LK, RANSAC
- ``frontend``  — SoA feature-track state machine
- ``imu``       — on-manifold preintegration (lax.scan)
- ``solver``    — batched Gauss–Newton/LM: PnP, windowed BA w/ Schur, IMU init
- ``estimator`` — sliding-window VIO state machine
- ``parallel``  — mesh/sharding + distributed BA reduction
- ``io``        — dataset readers, trajectory export
"""

__version__ = "0.1.0"

# Matmul precision is scoped to the library's own compiled functions
# (utils/precision.py wraps every jit boundary in float32 matmul
# precision at trace time) — importing this package does NOT mutate
# process-global JAX configuration.
