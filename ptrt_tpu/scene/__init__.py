from ptrt_tpu.scene.materials import Material, MaterialTable, Materials  # noqa: F401
from ptrt_tpu.scene.lights import Light, LightType, LightTable  # noqa: F401
from ptrt_tpu.scene.camera import Camera  # noqa: F401
