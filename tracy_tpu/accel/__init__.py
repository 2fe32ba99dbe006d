from tracy_tpu.accel.bvh import BVHArrays, build_scene_bvh, make_bvh_intersector

__all__ = ["BVHArrays", "build_scene_bvh", "make_bvh_intersector"]
