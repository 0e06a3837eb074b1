from gsjax.data.readers import SceneInfo, read_colmap_scene, read_blender_scene, load_scene  # noqa: F401
