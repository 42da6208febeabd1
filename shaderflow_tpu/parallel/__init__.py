from shaderflow_tpu.parallel.mesh import frame_mesh, shard_frame_renderer
