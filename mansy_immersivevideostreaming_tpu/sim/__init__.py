from mansy_immersivevideostreaming_tpu.sim.tables import SimTables, build_sim_tables
from mansy_immersivevideostreaming_tpu.sim.simulator import (
    NetState, simulate_download_bytes, push_chunk,
)
from mansy_immersivevideostreaming_tpu.sim.env import (
    EnvState, reset_env, step_env, observe_mansy, observe_simple,
    generate_environment_samples, generate_environment_test_samples,
)
