"""Point-cloud visualization of generated range images.

Port of ``LiDARGen/visualization.py``: un-log ``2^(6r)-1``, range image ->
xyz via the KITTI FoV (+3..-25 deg) grid, then render bird's-eye-view and
perspective scatter images for every saved diffusion step, optionally
assembled into an MP4 (ffmpeg).  The reference uses open3d offscreen
rendering; matplotlib is used here (always available in this image).

    python -m simultaneous_diffusion_for_pointclouds_tpu.eval.visualization \
        --input samples.npy --outdir viz/
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess

import numpy as np

from ..ops.geometry import kitti_sampler_grid


def range_image_to_points(range_img: np.ndarray, intensity: np.ndarray | None = None):
    """(H, W) log-range -> (N, 3[+1]) xyz points (visualization.py:15-44)."""
    h, w = range_img.shape
    grid = kitti_sampler_grid(h, w)
    dist = np.power(2.0, np.abs(range_img) * 6.0) - 1.0
    az = grid.azimuth()
    el = grid.elevation()
    x = dist * np.cos(az) * np.cos(el)
    y = dist * np.sin(az) * np.cos(el)
    z = dist * np.sin(el)
    pts = np.stack([x.ravel(), y.ravel(), z.ravel()], axis=1)
    keep = (dist.ravel() > 0.5) & (dist.ravel() < 63.0)
    pts = pts[keep]
    if intensity is not None:
        return np.concatenate([pts, intensity.ravel()[keep, None]], axis=1)
    return pts


def render_bev(points: np.ndarray, path: str, extent: float = 60.0):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 6), dpi=120)
    c = points[:, 3] if points.shape[1] > 3 else points[:, 2]
    ax.scatter(points[:, 0], points[:, 1], s=0.2, c=c, cmap="viridis", linewidths=0)
    ax.set_xlim(-extent, extent)
    ax.set_ylim(-extent, extent)
    ax.set_aspect("equal")
    ax.set_facecolor("black")
    ax.axis("off")
    fig.savefig(path, bbox_inches="tight", facecolor="black")
    plt.close(fig)


def render_perspective(points: np.ndarray, path: str):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(8, 5), dpi=120)
    ax = fig.add_subplot(projection="3d")
    c = points[:, 3] if points.shape[1] > 3 else points[:, 2]
    ax.scatter(points[:, 0], points[:, 1], points[:, 2], s=0.2, c=c, cmap="viridis")
    ax.view_init(elev=25, azim=-60)
    ax.set_axis_off()
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)


def visualize_tensor(sample: np.ndarray, outdir: str, prefix: str = "step"):
    """(B, 2, H, W) or (2, H, W) log-range samples -> BEV + perspective PNGs
    (visualization.py:52-65)."""
    os.makedirs(outdir, exist_ok=True)
    sample = np.asarray(sample)
    if sample.ndim == 3:
        sample = sample[None]
    paths = []
    for i, img in enumerate(sample):
        pts = range_image_to_points(img[0], img[1] if img.shape[0] > 1 else None)
        bev = os.path.join(outdir, f"{prefix}_{i}_bev.png")
        persp = os.path.join(outdir, f"{prefix}_{i}_persp.png")
        render_bev(pts, bev)
        render_perspective(pts, persp)
        paths.append((bev, persp))
    return paths


def make_video(frame_glob: str, out_path: str, fps: int = 10):
    """ffmpeg MP4 assembly (visualization.py:67-109); no-op if ffmpeg absent."""
    try:
        subprocess.run(
            ["ffmpeg", "-y", "-framerate", str(fps), "-pattern_type", "glob",
             "-i", frame_glob, "-pix_fmt", "yuv420p", out_path],
            check=True, capture_output=True,
        )
        return out_path
    except (FileNotFoundError, subprocess.CalledProcessError):
        return None


def render_step_movie(
    image_folder: str,
    outdir: str,
    fps: int = 10,
    max_samples: int | None = None,
):
    """The reference's step-movie flow (visualization.py:67-109): consume
    the ``samples_{i}.pth(.npy)`` per-level dumps written when
    ``sampling.final_only`` is false, render BEV + perspective frames per
    sample per level (the final frame is repeated for file_count/4 extra
    frames, as the reference does), and assemble per-sample MP4s with
    ffmpeg.  Returns {sample_index: [frame paths]}; MP4 paths are appended
    when ffmpeg is available."""
    os.makedirs(outdir, exist_ok=True)
    files = sorted(
        glob.glob(os.path.join(image_folder, "samples_*.pth.npy")),
        key=lambda p: int(os.path.basename(p).split("_")[1].split(".")[0]),
    )
    if not files:
        return {}
    frames: dict[int, list] = {}
    n_levels = len(files)
    for i, f in enumerate(files):
        tensor = np.load(f)
        n = tensor.shape[0] if max_samples is None else min(max_samples, tensor.shape[0])
        for j in range(n):
            pts = range_image_to_points(
                tensor[j][0], tensor[j][1] if tensor[j].shape[0] > 1 else None
            )
            bev = os.path.join(outdir, f"bev_{j}_{i:04d}.png")
            persp = os.path.join(outdir, f"pts_{j}_{i:04d}.png")
            render_bev(pts, bev)
            render_perspective(pts, persp)
            frames.setdefault(j, []).append(bev)
    # hold the final state for file_count/4 extra frames (reference :94-104)
    reps = max(n_levels // 4, 1)
    final = np.load(files[-1])
    n = final.shape[0] if max_samples is None else min(max_samples, final.shape[0])
    import shutil as _sh

    for j in range(n):
        src_bev = os.path.join(outdir, f"bev_{j}_{n_levels - 1:04d}.png")
        src_pts = os.path.join(outdir, f"pts_{j}_{n_levels - 1:04d}.png")
        for r in range(reps):
            for src, name in ((src_bev, "bev"), (src_pts, "pts")):
                dst = os.path.join(outdir, f"{name}_{j}_{n_levels + r:04d}.png")
                _sh.copyfile(src, dst)
                if name == "bev":
                    frames[j].append(dst)
    videos = {}
    for j in frames:
        for name in ("bev", "pts"):
            out = make_video(
                os.path.join(outdir, f"{name}_{j}_*.png"),
                os.path.join(outdir, f"{name}_{j}.mp4"),
                fps=fps,
            )
            if out:
                videos.setdefault(j, []).append(out)
    return {"frames": frames, "videos": videos}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", help=".npy of (B,2,H,W) samples or a glob")
    p.add_argument("--outdir", required=True)
    p.add_argument("--video", action="store_true")
    p.add_argument(
        "--steps", help="image folder with samples_{i}.pth.npy per-level dumps"
    )
    args = p.parse_args()
    if args.steps:
        render_step_movie(args.steps, args.outdir)
        return
    files = sorted(glob.glob(args.input)) or [args.input]
    for i, f in enumerate(files):
        visualize_tensor(np.load(f), args.outdir, prefix=f"f{i}")
    if args.video:
        make_video(os.path.join(args.outdir, "*_bev.png"), os.path.join(args.outdir, "bev.mp4"))


if __name__ == "__main__":
    main()
