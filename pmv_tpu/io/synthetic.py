"""Synthetic KITTI-like sequence generator.

The build/test environment has no KITTI download, so the framework generates
its own ground-truthed sequences: a 3D blob field rendered through a KITTI-
convention pinhole camera moving along a smooth forward trajectory. The
output can be materialized on disk as PNGs + ``calib.txt`` + ``poses.txt`` in
the exact layout the reference consumes (README.md:40-45), which lets every
end-to-end test exercise the same parsing/IO path as a real KITTI run.

Conventions: poses are KITTI ground-truth rows ``[R | t]`` = cam->world, with
the camera looking along +z. (The pipeline's internal world frame looks along
-z; the relation is the z-flip applied at OdometryPipeline.cpp:273-277.)
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from pmv_tpu.io.png import write_png

KITTI_K = np.array(
    [[718.856, 0.0, 607.1928], [0.0, 718.856, 185.2157], [0.0, 0.0, 1.0]]
)
KITTI_SHAPE = (370, 1226)  # (H, W) of KITTI odometry grayscale frames


def make_trajectory(n_frames: int, speed: float = 1.0, yaw_rate: float = 0.004,
                    seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Smooth forward trajectory: (R (T,3,3), t (T,3)) in KITTI convention.

    The camera drives forward (+z in its own frame) at ``speed`` m/frame,
    with a slowly varying yaw. Mimics KITTI 07 scale (~1 m/frame).
    """
    rng = np.random.default_rng(seed)
    yaw = 0.0
    pos = np.zeros(3)
    Rs, ts = [], []
    # smooth yaw-rate noise
    rates = yaw_rate * np.cumsum(rng.normal(0, 0.3, n_frames))
    rates = rates - np.linspace(0, rates[-1], n_frames)
    for k in range(n_frames):
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])
        Rs.append(R)
        ts.append(pos.copy())
        forward = R @ np.array([0.0, 0.0, 1.0])
        pos = pos + speed * forward
        yaw += yaw_rate + rates[k] * 0.05
    return np.stack(Rs), np.stack(ts)


def make_world(gt_R: np.ndarray, gt_t: np.ndarray, density: float = 60.0,
               seed: int = 0) -> np.ndarray:
    """Scatter 3D landmarks in a corridor around the trajectory.

    ``density`` points are seeded near every 5th camera position, offset
    laterally/vertically like building facades and road furniture.
    """
    rng = np.random.default_rng(seed + 1)
    pts = []
    for k in range(0, len(gt_t), 5):
        R, t = gt_R[k], gt_t[k]
        n = int(density)
        local = np.stack(
            [
                rng.uniform(-25, 25, n),       # lateral
                rng.uniform(-4, 6, n),         # vertical
                rng.uniform(4, 60, n),         # depth ahead
            ],
            axis=-1,
        )
        # keep points away from the camera axis so they project off-center too
        pts.append(local @ R.T + t)
    return np.concatenate(pts, axis=0)


def render_frame(
    K: np.ndarray,
    R: np.ndarray,
    t: np.ndarray,
    world: np.ndarray,
    shape: tuple[int, int] = (192, 640),
    point_ids: np.ndarray | None = None,
    seed: int = 0,
) -> np.ndarray:
    """Render a float32 grayscale frame by splatting Gaussian blobs at the
    projections of ``world`` points (standard pinhole: ``X_c = R^T (X_w - t)``,
    visible iff ``z_c > 0``)."""
    H, W = shape
    Xc = (world - t) @ R
    z = Xc[:, 2]
    vis = z > 0.5
    u = np.where(vis, Xc[:, 0] / np.where(vis, z, 1.0) * K[0, 0] + K[0, 2], -1)
    v = np.where(vis, Xc[:, 1] / np.where(vis, z, 1.0) * K[1, 1] + K[1, 2], -1)
    r = 3
    inb = vis & (u > r) & (u < W - r - 1) & (v > r) & (v < H - r - 1)
    img = np.zeros((H, W), np.float32)
    # deterministic per-point appearance
    if point_ids is None:
        point_ids = np.arange(len(world))
    amp = 80.0 + (point_ids % 97) * 1.5
    sig = 1.0 + (point_ids % 7) * 0.12
    ui, vi = u[inb], v[inb]
    ai, si = amp[inb], sig[inb]
    yy, xx = np.mgrid[-r : r + 1, -r : r + 1]
    for k in range(len(ui)):
        cx, cy = ui[k], vi[k]
        ix, iy = int(np.floor(cx)), int(np.floor(cy))
        dx, dy = cx - ix, cy - iy
        patch = ai[k] * np.exp(-(((xx - dx) ** 2 + (yy - dy) ** 2) / (2 * si[k] ** 2)))
        img[iy - r : iy + r + 1, ix - r : ix + r + 1] += patch
    # low-frequency background so flat regions still have mild gradient
    gy = np.linspace(0, 20, H)[:, None]
    gx = np.linspace(0, 10, W)[None, :]
    img += gy + gx
    return np.clip(img, 0, 255.0)


def make_sequence(
    n_frames: int = 30,
    shape: tuple[int, int] = (192, 640),
    K: np.ndarray | None = None,
    speed: float = 1.0,
    yaw_rate: float = 0.004,
    density: float = 60.0,
    seed: int = 0,
) -> dict:
    """In-memory synthetic sequence: images (T,H,W) f32, gt_R, gt_t, K, world."""
    H, W = shape
    if K is None:
        K = np.array(
            [[0.6 * W, 0.0, W / 2.0], [0.0, 0.6 * W, H / 2.0], [0.0, 0.0, 1.0]]
        )
    gt_R, gt_t = make_trajectory(n_frames, speed=speed, yaw_rate=yaw_rate, seed=seed)
    world = make_world(gt_R, gt_t, density=density, seed=seed)
    ids = np.arange(len(world))
    imgs = np.stack(
        [render_frame(K, gt_R[k], gt_t[k], world, shape, ids, seed) for k in range(n_frames)]
    )
    return {"images": imgs, "gt_R": gt_R, "gt_t": gt_t, "K": K, "world": world}


def write_kitti_layout(seq: dict, out_dir: str | Path) -> dict[str, str]:
    """Materialize a synthetic sequence in the on-disk layout the reference
    consumes: image_0/NNNNNN.png, calib.txt (P0..P3 lines), poses.txt."""
    out = Path(out_dir)
    img_dir = out / "image_0"
    img_dir.mkdir(parents=True, exist_ok=True)
    for k, img in enumerate(seq["images"]):
        write_png(img_dir / f"{k:06d}.png", img.astype(np.uint8))
    K = seq["K"]
    P = np.concatenate([K, np.zeros((3, 1))], axis=1).reshape(-1)
    p_line = " ".join(f"{v:.12e}" for v in P)
    calib = "\n".join(f"P{i}: {p_line}" for i in range(4)) + "\n"
    (out / "calib.txt").write_text(calib)
    lines = []
    for R, t in zip(seq["gt_R"], seq["gt_t"]):
        M = np.concatenate([R, t[:, None]], axis=1).reshape(-1)
        lines.append(" ".join(f"{v:.12e}" for v in M))
    (out / "poses.txt").write_text("\n".join(lines) + "\n")
    return {
        "image_dir": str(img_dir),
        "camera_calibration": str(out / "calib.txt"),
        "poses": str(out / "poses.txt"),
    }
