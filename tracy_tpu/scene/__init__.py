from tracy_tpu.scene.hostmesh import HostMesh
from tracy_tpu.scene.scene import SceneArrays, SceneBuilder, SKY_MATERIAL_ID
from tracy_tpu.scene.scn_parser import load_scene

__all__ = ["HostMesh", "SceneArrays", "SceneBuilder", "SKY_MATERIAL_ID", "load_scene"]
