"""MANSY ImmersiveVideoStreaming — TPU-native (JAX/XLA/Pallas) framework.

A ground-up rebuild of the capabilities of the reference
``duowuyms/MANSY_ImmersiveVideoStreaming`` stack:

* viewport prediction (MTIO ensemble Transformer + linear-regression baseline)
* tile-based 360° streaming simulator (trace-driven, fully functional/vmapped)
* bitrate selection via deep RL (PPO + QoE-preference identifier, A2C baseline,
  MPC expert) — all as jitted pure functions over device-resident tables.
"""

from mansy_immersivevideostreaming_tpu.config import Config, default_config, load_config

__version__ = "0.1.0"

__all__ = ["Config", "default_config", "load_config", "__version__"]
