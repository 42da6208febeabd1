from shaderflow_tpu.parallel.mesh import frame_mesh, shard_frame_renderer
from shaderflow_tpu.parallel.multihost import (
    export_segment, join_segments, segment_plan)
