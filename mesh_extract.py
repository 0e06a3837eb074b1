"""TSDF mesh extraction CLI (DTU route). Mirrors reference mesh_extract.py."""

import os
from argparse import ArgumentParser

import numpy as np


def main():
    from gsjax.config import ModelParams, PipelineParams, get_combined_args
    from gsjax.data.ply import write_ply
    from gsjax.data.readers import load_scene
    from gsjax.mesh.extract import extract_mesh_tsdf
    from gsjax.model import gaussians as gm
    from gsjax.model.io import load_ply
    from gsjax.ops.raster import RasterConfig, render
    from gsjax.utils.system import search_max_iteration

    parser = ArgumentParser(description="TSDF mesh extraction")
    ModelParams(parser, sentinel=True)
    PipelineParams(parser)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--num_cluster", default=1, type=int)
    parser.add_argument("--voxel_size", default=0.002, type=float)
    parser.add_argument("--cull", action="store_true",
                        help="drop faces unobserved by any training camera "
                             "(frustum + rendered-depth occlusion; the "
                             "eval_tnt/cull_mesh.py protocol)")
    parser.add_argument("--quiet", action="store_true")
    args = get_combined_args(parser)

    iteration = args.iteration
    if iteration == -1:
        iteration = search_max_iteration(os.path.join(args.model_path, "point_cloud"))
    params, aux = load_ply(os.path.join(args.model_path, "point_cloud",
                                        f"iteration_{iteration}", "point_cloud.ply"))
    scene = load_scene(args.source_path, args.images, args.masks or None,
                       getattr(args, "eval", False), args.resolution,
                       args.white_background)

    import jax.numpy as jnp
    bg = jnp.ones(3)  # reference renders on white for TSDF (mesh_extract.py:46)
    cfg = RasterConfig(sh_degree=args.sh_degree,
                       sg_degree=getattr(args, "sg_degree", 0),
                       kernel_size=args.kernel_size, require_depth=True,
                       pair_capacity=1 << 22, max_per_tile=1 << 12)

    def render_fn(view):
        scales, opac = gm.scaling_n_opacity_with_3d_filter(params, aux.filter_3d)
        return render(params.xyz, scales, params.rotation, opac,
                      gm.get_features(params), view.camera, cfg, bg,
                      sg_axis=gm.get_sg_axis(params),
                      sg_sharpness=gm.get_sg_sharpness(params),
                      sg_color=params.sg_color, alive=aux.alive)

    meshes = extract_mesh_tsdf(render_fn, scene.train_views,
                               voxel_size=args.voxel_size,
                               cluster_to_keep=args.num_cluster)
    if getattr(args, "cull", False):
        from gsjax.mesh.cluster import cull_mesh
        meshes["post"] = cull_mesh(*meshes["post"], scene.train_views,
                                   depths=meshes["depths"])
    for name, (v, f) in [("recon", meshes["raw"]), ("recon_post", meshes["post"])]:
        write_ply(os.path.join(args.model_path, f"{name}.ply"),
                  dict(x=v[:, 0].astype(np.float32), y=v[:, 1].astype(np.float32),
                       z=v[:, 2].astype(np.float32)), faces=f)
    print("done!")


if __name__ == "__main__":
    main()
