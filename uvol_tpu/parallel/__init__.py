from uvol_tpu.parallel.mesh import (  # noqa: F401
    BLOCK_AXIS,
    FRAME_AXIS,
    initialize_distributed,
    frame_sharding,
    make_mesh,
    pad_frames_to_mesh,
    replicated,
    shard_frames,
)
