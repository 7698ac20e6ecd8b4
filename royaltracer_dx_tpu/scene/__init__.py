from royaltracer_dx_tpu.scene.types import (
    Materials,
    MeshData,
    LightTriangles,
    SceneArrays,
)
from royaltracer_dx_tpu.scene.scene import Scene

__all__ = ["Materials", "MeshData", "LightTriangles", "SceneArrays", "Scene"]
