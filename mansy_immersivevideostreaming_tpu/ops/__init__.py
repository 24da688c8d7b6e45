from mansy_immersivevideostreaming_tpu.ops.geometry import (
    periodic_mse, wrap_position, tile_occupancy, tile_occupancy_from_normalized,
    batched_tile_occupancy, iou_accuracy, tile_metrics,
)
from mansy_immersivevideostreaming_tpu.ops.allocation import (
    ACTION_TO_RATES, action_to_rates, rates_to_action, viewport_scales,
    allocate_tile_rates, allocate_for_actions,
)
from mansy_immersivevideostreaming_tpu.ops.qoe import (
    QoEState, init_qoe_state, qoe_step, qoe_step_with_given_quality,
    normalize_quality, normalize_size, normalize_throughput, normalize_qoe_weight,
)
