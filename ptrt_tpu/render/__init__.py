from ptrt_tpu.render.ray import RayBatch  # noqa: F401
from ptrt_tpu.render.traverse import Hit, intersect_closest, intersect_any  # noqa: F401
