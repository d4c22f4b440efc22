from ptrt_tpu.parallel.sharding import (  # noqa: F401
    make_pixel_mesh,
    replicate,
    shard_pixels,
)
