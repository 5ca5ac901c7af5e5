"""Shared test helper: render Gaussian-blob images."""

import numpy as np


def blob_image(shape, centers, amp=100.0, sigma=1.5):
    H, W = shape
    yy, xx = np.mgrid[0:H, 0:W]
    img = np.zeros(shape, np.float32)
    for cx, cy in centers:
        img += amp * np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * sigma**2)))
    return img
