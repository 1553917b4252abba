"""Scene content models: skybox, disk textures, lifecycle entities, disk_v2."""
