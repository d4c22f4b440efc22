from ptrt_tpu.parallel.sharding import (  # noqa: F401
    make_pixel_mesh,
    shard_pixels,
    sharded_frame_fn,
)
