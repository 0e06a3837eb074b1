"""Marching-tetrahedra mesh extraction CLI (TnT route).
Mirrors reference mesh_extract_tetrahedra.py."""

import os
from argparse import ArgumentParser

import numpy as np


def main():
    from gsjax.config import ModelParams, PipelineParams, get_combined_args
    from gsjax.data.ply import write_ply
    from gsjax.data.readers import load_scene
    from gsjax.mesh.extract import extract_mesh_tetrahedra
    from gsjax.model.io import load_ply
    from gsjax.ops.raster import RasterConfig
    from gsjax.utils.system import search_max_iteration

    parser = ArgumentParser(description="marching tetrahedra mesh extraction")
    ModelParams(parser, sentinel=True)
    PipelineParams(parser)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--num_cluster", default=1, type=int)
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--move_cpu", action="store_true")
    args = get_combined_args(parser)

    iteration = args.iteration
    if iteration == -1:
        iteration = search_max_iteration(os.path.join(args.model_path, "point_cloud"))
    params, aux = load_ply(os.path.join(args.model_path, "point_cloud",
                                        f"iteration_{iteration}", "point_cloud.ply"))
    scene = load_scene(args.source_path, args.images, args.masks or None,
                       getattr(args, "eval", False), args.resolution,
                       args.white_background)

    cfg = RasterConfig(sh_degree=args.sh_degree,
                       sg_degree=getattr(args, "sg_degree", 0),
                       kernel_size=args.kernel_size, require_depth=True,
                       pair_capacity=1 << 22, max_per_tile=1 << 12)
    meshes = extract_mesh_tetrahedra(params, aux, scene.train_views, cfg,
                                     cluster_to_keep=args.num_cluster)
    outs = [("recon_init", meshes["init"]), ("recon", meshes["raw"]),
            ("recon_post", meshes["post"])]
    for name, (v, f) in outs:
        write_ply(os.path.join(args.model_path, f"{name}.ply"),
                  dict(x=v[:, 0].astype(np.float32), y=v[:, 1].astype(np.float32),
                       z=v[:, 2].astype(np.float32)), faces=np.asarray(f))
    print("done!")


if __name__ == "__main__":
    main()
