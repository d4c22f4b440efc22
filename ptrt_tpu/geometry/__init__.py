from ptrt_tpu.geometry.mesh import Mesh  # noqa: F401
from ptrt_tpu.geometry.transform import Transform3D  # noqa: F401
from ptrt_tpu.geometry.bvh import build_bvh, FlatBVH  # noqa: F401
