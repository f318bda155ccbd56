"""Rendering / evaluation entry point — ``python -m splatfields_tpu.render``.

Parity target: reference ``render.py`` (``render_sets`` :342-369,
``render_set`` :268-338): reload model + field weights at an iteration,
render train/test/pred camera sets to PNGs + an mp4, optional JET-colormap
depth maps, then compute PSNR / masked-SSIM / LPIPS into ``results.yaml``.
"""
from __future__ import annotations

import os
import sys

import numpy as np

from splatfields_tpu import config as cfg_lib
from splatfields_tpu import metrics
from splatfields_tpu.models.deform_model import DeformModel
from splatfields_tpu.render_lib import render_camera, render_cameras_batched
from splatfields_tpu.scene import Scene
from splatfields_tpu.utils.system import mkdir_p

DEPTH_MIN = 9.0


def _to_png(img_chw: np.ndarray) -> np.ndarray:
    img = np.clip(np.asarray(img_chw), 0, 1)
    return (img.transpose(1, 2, 0) * 255).astype(np.uint8)


def render_set(model_path, name, iteration, views, params, stats, deform,
               pipe_cfg, bg, field_mode, n_frames, sh_degree,
               render_depth=False, save_video=True, lpips_weights=None,
               render_batch=8):
    base = os.path.join(model_path, name, f"ours_{iteration}")
    render_path = os.path.join(base, "renders")
    gts_path = os.path.join(base, "gt")
    depth_path = os.path.join(base, "depth")
    mkdir_p(render_path)
    mkdir_p(gts_path)
    if render_depth:
        mkdir_p(depth_path)

    import cv2
    frames = []
    dropped_views = 0
    # batch frames per device dispatch when the set is resolution-uniform
    # (render_lib.render_cameras_batched — amortizes the ~ms relay
    # dispatch cost over render_batch frames; per-frame otherwise)
    uniform = len({(v.image_width, v.image_height) for v in views}) == 1
    if render_batch > 1 and uniform and len(views) > 1:
        outs = render_cameras_batched(
            views, params, stats, deform, pipe_cfg, bg,
            field_mode=field_mode, n_frames=n_frames, sh_degree=sh_degree,
            batch=render_batch)
    else:
        outs = (render_camera(v, params, stats, deform, pipe_cfg, bg,
                              field_mode=field_mode, n_frames=n_frames,
                              sh_degree=sh_degree) for v in views)
    for idx, (view, out) in enumerate(zip(views, outs)):
        if int(out["n_dropped"]) > 0:
            dropped_views += 1
            if dropped_views <= 3:
                print(f"[render] warning: view {idx} dropped "
                      f"{int(out['n_dropped'])} instances beyond the "
                      f"dup budget (dup_factor={pipe_cfg.dup_factor}); "
                      f"increase --dup_factor to render all splats")
        img = _to_png(out["render"])
        cv2.imwrite(os.path.join(render_path, f"{idx:05d}.png"),
                    img[..., ::-1])
        frames.append(img)
        if view.image is not None:
            cv2.imwrite(os.path.join(gts_path, f"{idx:05d}.png"),
                        _to_png(view.image)[..., ::-1])
        if render_depth:
            depth = np.asarray(out["depth"])[0]
            dmax = max(depth.max(), DEPTH_MIN + 1e-3)
            dvis = np.clip((depth - DEPTH_MIN) / (dmax - DEPTH_MIN), 0, 1)
            dmap = cv2.applyColorMap((dvis * 255).astype(np.uint8),
                                     cv2.COLORMAP_JET)
            cv2.imwrite(os.path.join(depth_path, f"{idx:05d}.png"), dmap)

    if save_video and frames:
        try:
            import imageio.v2 as imageio
            imageio.mimwrite(os.path.join(base, "video.mp4"),
                             frames, fps=20, quality=8)
        except Exception as e:  # no ffmpeg backend: animated GIF fallback
            import PIL.Image
            ims = [PIL.Image.fromarray(f) for f in frames]
            ims[0].save(os.path.join(base, "video.gif"), save_all=True,
                        append_images=ims[1:], duration=50, loop=0)
            print(f"mp4 export unavailable ({e}); wrote video.gif")

    if any(v.image is not None for v in views):
        return metrics.eval_all(base, lpips_weights_path=lpips_weights)
    return {}


def render_sets(model_cfg, hidden_cfg, pipe_cfg, iteration,
                skip_train=False, skip_test=False, skip_pred=True,
                render_depth=False, lpips_weights=None, render_batch=8):
    n_frames = model_cfg.load_time_step if model_cfg.load_time_step > 1 else 0
    hidden_cfg.n_frames = n_frames
    scene = Scene(model_cfg, load_iteration=iteration, shuffle=False)
    params, stats = scene.splats, scene.splat_stats
    is_static = model_cfg.is_static
    deform = None
    if not is_static:
        deform = DeformModel(hidden_cfg, radius=scene.cameras_extent)
        deform.load_weights(model_cfg.model_path, iteration)

    sh_degree = (scene.loaded_sh_degree if scene.loaded_sh_degree is not None
                 else model_cfg.sh_degree)
    bg = np.array([1, 1, 1] if model_cfg.white_background else [0, 0, 0],
                  np.float32)
    results = {}
    it = scene.loaded_iter or iteration
    if not skip_train:
        results["train"] = render_set(
            model_cfg.model_path, "train", it, scene.get_train_cameras(),
            params, stats, deform, pipe_cfg, bg, not is_static, n_frames,
            sh_degree, render_depth, lpips_weights=lpips_weights,
            render_batch=render_batch)
    if not skip_test:
        results["test"] = render_set(
            model_cfg.model_path, "test", it, scene.get_test_cameras(),
            params, stats, deform, pipe_cfg, bg, not is_static, n_frames,
            sh_degree, render_depth, lpips_weights=lpips_weights,
            render_batch=render_batch)
    if not skip_pred:
        results["pred"] = render_set(
            model_cfg.model_path, "pred", it, scene.get_pred_cameras(),
            params, stats, deform, pipe_cfg, bg, not is_static, n_frames,
            sh_degree, render_depth, lpips_weights=lpips_weights,
            render_batch=render_batch)
    return results


def main(argv=None):
    from splatfields_tpu.utils.system import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    parser = cfg_lib.build_parser("SplatFields-TPU rendering", sentinel=True)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--render_pred", action="store_true")
    parser.add_argument("--render_depth", action="store_true")
    parser.add_argument("--lpips_weights", default=None, type=str,
                        help="local VGG-LPIPS .npz (see ops/lpips.py); "
                             "defaults to $SPLATFIELDS_LPIPS or "
                             "weights/lpips_vgg.npz")
    parser.add_argument("--render_batch", default=8, type=int,
                        help="frames per device dispatch (lax.scan; "
                             "amortizes relay dispatch cost for offline "
                             "rendering). 0/1 = one dispatch per frame")
    args = cfg_lib.get_combined_args(parser, argv if argv is not None
                                     else sys.argv[1:])
    model_cfg, pipe_cfg, hidden_cfg, _ = cfg_lib.extract_configs(args)
    print("Rendering " + model_cfg.model_path)
    render_sets(model_cfg, hidden_cfg, pipe_cfg, args.iteration,
                skip_train=args.skip_train, skip_test=args.skip_test,
                skip_pred=not args.render_pred,
                render_depth=args.render_depth,
                lpips_weights=getattr(args, "lpips_weights", None),
                render_batch=getattr(args, "render_batch", 8))


if __name__ == "__main__":
    main()
