"""NVS rendering CLI: render train/test splits to PNG trees.

Mirrors the reference `render.py:24-65` output layout
(<model>/{train,test}/ours_<iter>/{renders,gt}/#####.png)."""

import os
import sys
from argparse import ArgumentParser

import numpy as np


def save_png(path, arr):
    from PIL import Image

    Image.fromarray((np.clip(np.asarray(arr), 0, 1) * 255).astype(np.uint8)).save(path)


def _res_chunks(views, batch):
    """Contiguous runs of same-resolution views, at most `batch` long (the
    view-parallel path batches same-shape cameras over the mesh)."""
    i = 0
    while i < len(views):
        wh = (views[i].camera.width, views[i].camera.height)
        j = i + 1
        while (j < len(views) and j - i < batch
               and (views[j].camera.width, views[j].camera.height) == wh):
            j += 1
        yield i, views[i:j]
        i = j


def render_set(model_path, name, iteration, views, render_batch_fn,
               save_depth=False, batch=1):
    renders_path = os.path.join(model_path, name, f"ours_{iteration}", "renders")
    gts_path = os.path.join(model_path, name, f"ours_{iteration}", "gt")
    os.makedirs(renders_path, exist_ok=True)
    os.makedirs(gts_path, exist_ok=True)
    if save_depth:
        depth_path = os.path.join(model_path, name, f"ours_{iteration}", "depth")
        os.makedirs(depth_path, exist_ok=True)
    for i0, chunk in _res_chunks(views, batch):
        outs = render_batch_fn(chunk)
        for k, (view, out) in enumerate(zip(chunk, outs)):
            idx = i0 + k
            save_png(os.path.join(renders_path, f"{idx:05d}.png"), out["render"])
            save_png(os.path.join(gts_path, f"{idx:05d}.png"), view.image)
            if save_depth:
                from PIL import Image

                from gsjax.utils.trajectories import apply_depth_colormap
                Image.fromarray(apply_depth_colormap(
                    np.asarray(out["median_depth"]))).save(
                    os.path.join(depth_path, f"{idx:05d}.png"))
        print(f"\r{name} {i0 + len(chunk)}/{len(views)}", end="", flush=True)
    print()


def main():
    from gsjax.config import ModelParams, PipelineParams, get_combined_args
    from gsjax.data.readers import load_scene
    from gsjax.model import gaussians as gm
    from gsjax.model.io import load_ply
    from gsjax.ops.raster import RasterConfig, render
    from gsjax.utils.system import search_max_iteration

    parser = ArgumentParser(description="gsjax rendering")
    ModelParams(parser, sentinel=True)
    PipelineParams(parser)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--traj_frames", default=0, type=int,
                        help="also render an N-frame ellipse flythrough "
                             "(render_utils.py generate_path equivalent)")
    parser.add_argument("--save_depth", action="store_true",
                        help="write colormapped median-depth PNGs too")
    parser.add_argument("--video", action="store_true",
                        help="stitch the flythrough frames into .mp4s "
                             "(render_utils.py create_videos equivalent)")
    parser.add_argument("--n_devices", default=1, type=int,
                        help="render views data-parallel over a device mesh "
                             "(<=0 = all devices; 1 = single-device)")
    parser.add_argument("--pair_capacity", default=1 << 22, type=int,
                        help="static (gaussian,tile) pair buffer size")
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
    bg = jnp.ones(3) if args.white_background else jnp.zeros(3)
    sg_deg = getattr(args, "sg_degree", 0)

    cfg = RasterConfig(sh_degree=args.sh_degree, sg_degree=sg_deg,
                       kernel_size=args.kernel_size, require_depth=True,
                       pair_capacity=args.pair_capacity,
                       max_per_tile=1 << 12)

    if args.n_devices != 1:
        # serving path: whole views data-parallel over the mesh
        from gsjax.parallel import make_mesh, render_views_sharded

        mesh = make_mesh(None if args.n_devices <= 0 else args.n_devices)
        batch = mesh.devices.size
        print(f"view-parallel rendering over {batch} devices")

        def render_batch_fn(views):
            outs = render_views_sharded(
                params, aux, [v.camera for v in views], cfg, bg, mesh)
            return [{k: v[i] for k, v in outs.items()}
                    for i in range(len(views))]
    else:
        batch = 1

        def render_batch_fn(views):
            scales, opac = gm.scaling_n_opacity_with_3d_filter(
                params, aux.filter_3d)
            return [render(params.xyz, scales, params.rotation, opac,
                           gm.get_features(params), v.camera, cfg, bg,
                           sg_axis=gm.get_sg_axis(params),
                           sg_sharpness=gm.get_sg_sharpness(params),
                           sg_color=params.sg_color, alive=aux.alive)
                    for v in views]

    if not args.skip_train:
        render_set(args.model_path, "train", iteration, scene.train_views,
                   render_batch_fn, save_depth=args.save_depth, batch=batch)
    if not args.skip_test and scene.test_views:
        render_set(args.model_path, "test", iteration, scene.test_views,
                   render_batch_fn, save_depth=args.save_depth, batch=batch)
    if args.traj_frames > 0:
        from gsjax.utils.trajectories import generate_path

        class _TrajView:
            def __init__(self, camera):
                self.camera = camera
                self.image = np.zeros((camera.height, camera.width, 3),
                                      np.float32)

        cams = generate_path([v.camera for v in scene.train_views],
                             n_frames=args.traj_frames)
        render_set(args.model_path, "traj", iteration,
                   [_TrajView(c) for c in cams], render_batch_fn,
                   save_depth=args.save_depth, batch=batch)
        if args.video:
            from gsjax.utils.trajectories import create_videos
            out = create_videos(
                args.model_path,
                os.path.join(args.model_path, "traj", f"ours_{iteration}"),
                f"traj_{iteration}", num_frames=args.traj_frames)
            print("videos:", ", ".join(out))


if __name__ == "__main__":
    main()
