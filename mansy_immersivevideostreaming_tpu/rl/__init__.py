from mansy_immersivevideostreaming_tpu.rl.types import Transition, RunningStat
from mansy_immersivevideostreaming_tpu.rl.gae import compute_gae
from mansy_immersivevideostreaming_tpu.rl.rollout import make_collector
from mansy_immersivevideostreaming_tpu.rl.ppo import PPOConfig, ppo_update
from mansy_immersivevideostreaming_tpu.rl.a2c import A2CConfig, a2c_update
from mansy_immersivevideostreaming_tpu.rl.identifier import (
    identifier_rewards, train_identifier_on_buffer,
)
