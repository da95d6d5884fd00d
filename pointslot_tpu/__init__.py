"""pointslot_tpu — TPU-native stereo Simultaneous Localization and Object
Tracking (SLOT) framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
pkzhou/PointSLOT (stereo ORB-SLAM2 + camera-centric object tracking +
object bundle adjustment). See DESIGN.md for the architecture.
"""

__version__ = "0.1.0"

from pointslot_tpu.config import (  # noqa: F401
    SLOTMode,
    SystemConfig,
    load_yaml,
)
