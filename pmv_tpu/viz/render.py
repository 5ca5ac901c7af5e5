"""Trajectory-map and frame-annotation rendering (numpy raster).

Offline replacements for the reference's live GUI output: ``drawMap``
(OdometryPipeline.cpp:104-169 — 511x511 top-down map, landmark dots colored
by image side, green estimated path/pose rectangle, red ground truth) and
the per-frame feature crosses (``drawCross``, :93-102). A headless TPU run
renders the same artifacts to PNG/AVI instead of cv::imshow windows.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

GREEN = (0, 255, 0)
RED = (255, 0, 0)
MAGENTA = (255, 0, 255)
CYAN = (0, 255, 255)

MAP_SIZE = 511  # reference map canvas (OdometryPipeline.cpp:107)


def _put(img: np.ndarray, r, c, color) -> None:
    H, W = img.shape[:2]
    r = np.asarray(r, int).reshape(-1)
    c = np.asarray(c, int).reshape(-1)
    ok = (r >= 0) & (r < H) & (c >= 0) & (c < W)
    img[r[ok], c[ok]] = color


def draw_cross(img: np.ndarray, row: int, col: int, color, radius: int = 3) -> None:
    """Reference drawCross (OdometryPipeline.cpp:93-102)."""
    rr = np.arange(-radius + 1, radius)
    _put(img, np.full_like(rr, row), col + rr, color)
    _put(img, row + rr, np.full_like(rr, col), color)


def draw_circle(img: np.ndarray, row: float, col: float, radius: int, color) -> None:
    yy, xx = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    m = yy**2 + xx**2 <= radius**2
    _put(img, row + yy[m], col + xx[m], color)


def draw_map(
    t_est: np.ndarray,
    gt_t: np.ndarray,
    init_offset: int,
    map_scale: float,
    landmarks: np.ndarray | None = None,
    landmark_cols: np.ndarray | None = None,
    img_width: int = 1226,
) -> np.ndarray:
    """Top-down map (MAP_SIZE x MAP_SIZE x 3 uint8) in the reference's frame:
    x -> map column from center, z -> map row from rows/1.2 (estimate uses
    +z, ground truth -z, exactly as OdometryPipeline.cpp:131-168)."""
    m = np.zeros((MAP_SIZE, MAP_SIZE, 3), np.uint8)
    cx = MAP_SIZE // 2
    cy = int(MAP_SIZE / 1.2)

    if landmarks is not None and len(landmarks):
        cols = (
            landmark_cols
            if landmark_cols is not None
            else np.zeros(len(landmarks))
        )
        color_sel = cols > img_width / 2
        r = cy + (landmarks[:, 2] * map_scale).astype(int)
        c = cx + (landmarks[:, 0] * map_scale).astype(int)
        _put(m, r[color_sel], c[color_sel], MAGENTA)
        _put(m, r[~color_sel], c[~color_sel], CYAN)

    j = len(t_est) - 1
    for i in range(j + 1):
        draw_circle(m, cy + int(t_est[i][2] * map_scale), cx + int(t_est[i][0] * map_scale), 1, GREEN)
        g = i + init_offset
        if g < len(gt_t):
            draw_circle(m, cy - int(gt_t[g][2] * map_scale), cx + int(gt_t[g][0] * map_scale), 1, RED)
    return m


def annotate_frame(
    img: np.ndarray,
    xy: np.ndarray,
    valid: np.ndarray,
    img_width: int | None = None,
) -> np.ndarray:
    """Feature crosses on a grayscale frame, colored by image side like the
    reference (OdometryPipeline.cpp:117-124)."""
    W = img_width or img.shape[1]
    rgb = np.stack([np.clip(img, 0, 255).astype(np.uint8)] * 3, axis=-1)
    for (u, v), ok in zip(np.asarray(xy), np.asarray(valid)):
        if not ok:
            continue
        color = MAGENTA if u > W / 2 else CYAN
        draw_cross(rgb, int(v), int(u), color)
    return rgb


def save_run_visuals(pipe, out_dir: str | Path | None = None) -> dict:
    """Post-run artifacts: trajectory map PNG (+ AVI when video_path set)."""
    from pmv_tpu.io.png import write_png

    out = Path(out_dir) if out_dir else Path(pipe.cfg.error_path or ".").parent
    out.mkdir(parents=True, exist_ok=True)
    alive = np.asarray(pipe.map.alive)
    lms = np.asarray(pipe.map.xyz)[alive]
    m = draw_map(
        [np.asarray(x) for x in pipe.t],
        pipe.gt_t,
        pipe.init_offset,
        pipe.cfg.map_scale,
        landmarks=lms,
    )
    map_path = out / "map.png"
    write_png(map_path, m)
    artifacts = {"map": str(map_path)}

    from pmv_tpu.viz.pointcloud import export_map

    ply_path = out / "pointcloud.ply"
    n_pts = export_map(pipe, ply_path)
    artifacts["pointcloud"] = str(ply_path)
    artifacts["pointcloud_points"] = n_pts

    if pipe.cfg.video_path:
        from pmv_tpu.io.prefetch import FramePrefetcher
        from pmv_tpu.viz.video import AVIWriter

        writer = AVIWriter(pipe.cfg.video_path, fps=10)
        start = pipe.init_offset
        stop = min(pipe.cfg.frames, len(pipe.file_names))
        for idx, img in FramePrefetcher(pipe.file_names[start:stop]):
            k = idx  # frame table index
            if k >= len(pipe.tables):
                break
            tbl = pipe.tables[k]
            frame = annotate_frame(img, np.asarray(tbl.xy), np.asarray(tbl.valid))
            if pipe.cfg.fancy_video:
                # Reference fancy_video: alpha-blend the live map into a
                # square region of the frame (OdometryPipeline.cpp:415-422,
                # alpha 0.75).
                side = min(frame.shape[0], frame.shape[1])
                # nearest-neighbor resize of the map to (side, side)
                ys = (np.arange(side) * (m.shape[0] / side)).astype(int)
                xs = (np.arange(side) * (m.shape[1] / side)).astype(int)
                m_small = m[ys][:, xs]
                roi = frame[:side, :side].astype(np.float32)
                frame[:side, :side] = np.clip(
                    0.75 * m_small + 0.25 * roi, 0, 255
                ).astype(np.uint8)
            writer.add(frame)
        writer.close()
        artifacts["video"] = pipe.cfg.video_path
    return artifacts
