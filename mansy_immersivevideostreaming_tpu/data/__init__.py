from mansy_immersivevideostreaming_tpu.data.manifest import load_manifest, load_manifest_tables
from mansy_immersivevideostreaming_tpu.data.network import load_network_trace, load_network_tables
from mansy_immersivevideostreaming_tpu.data.prediction import (
    load_prediction, load_prediction_tables, write_prediction,
)
from mansy_immersivevideostreaming_tpu.data.viewport import (
    load_viewport_trace, pack_viewport_traces, WindowedViewportDataset,
)
