"""Experimental video marker tracking -> per-block motion histories.

Tracks bright (or dark) circular markers through a high-speed video of a
physical sample and reduces them to per-block (ux, uy, theta) histories
shaped like :class:`~difflexmm_tpu.utils.types.SolutionData` fields, ready
for experiment-vs-simulation comparison via
``objectives.compute_space_time_xcorr``.

Behavioral parity target: the reference's tracking pipeline
(scripts/tracking/*: contour/threshold tracking, per-block pose from marker
pairs, damping-ratio identification). This implementation uses OpenCV
thresholding + contour centroids with nearest-neighbor frame-to-frame
matching; block pose comes from the rigid transform of its markers.
"""

from dataclasses import dataclass
from pathlib import Path
from typing import List, Optional, Tuple, Union

import numpy as np


# ---------------------------------------------------------------------------
# Marker detection and tracking
# ---------------------------------------------------------------------------


def detect_markers(
    frame: np.ndarray,
    threshold: int = 127,
    bright: bool = True,
    min_area: float = 4.0,
    max_area: float = 1e5,
) -> np.ndarray:
    """Centroids (n, 2) of thresholded blobs in a grayscale frame."""

    import cv2

    if frame.ndim == 3:
        frame = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
    mode = cv2.THRESH_BINARY if bright else cv2.THRESH_BINARY_INV
    _, mask = cv2.threshold(frame, threshold, 255, mode)
    contours, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    centroids = []
    for contour in contours:
        area = cv2.contourArea(contour)
        if not (min_area <= area <= max_area):
            continue
        m = cv2.moments(contour)
        if m["m00"] > 0:
            centroids.append((m["m10"] / m["m00"], m["m01"] / m["m00"]))
    return np.asarray(centroids).reshape(-1, 2)


def match_markers(previous: np.ndarray, current: np.ndarray,
                  max_distance: float = np.inf) -> np.ndarray:
    """Greedy nearest-neighbor match: for each previous marker, the closest
    current centroid (within ``max_distance``; unmatched keep the previous
    position). Returns (n_prev, 2)."""

    if len(current) == 0:
        return previous.copy()
    matched = previous.copy()
    distances = np.linalg.norm(previous[:, None] - current[None], axis=-1)
    for k in np.argsort(distances.min(axis=1)):
        j = int(np.argmin(distances[k]))
        if distances[k, j] <= max_distance:
            matched[k] = current[j]
            distances[:, j] = np.inf
    return matched


def track_video(
    video_path: Union[str, Path],
    threshold: int = 127,
    bright: bool = True,
    min_area: float = 4.0,
    max_frames: Optional[int] = None,
    max_step_px: float = 50.0,
) -> np.ndarray:
    """Track markers through a video; (n_frames, n_markers, 2) pixel paths.

    Marker identity is fixed by the first frame's detections.
    """

    import cv2

    cap = cv2.VideoCapture(str(video_path))
    paths = []
    current = None
    while True:
        ok, frame = cap.read()
        if not ok or (max_frames is not None and len(paths) >= max_frames):
            break
        detections = detect_markers(frame, threshold, bright, min_area)
        if current is None:
            if len(detections) == 0:
                continue
            # Stable ordering: sort by (y, x)
            order = np.lexsort((detections[:, 0], detections[:, 1]))
            current = detections[order]
        else:
            current = match_markers(current, detections, max_step_px)
        paths.append(current.copy())
    cap.release()
    if not paths:
        raise IOError(f"No trackable frames in {video_path}.")
    return np.stack(paths)


# ---------------------------------------------------------------------------
# Marker paths -> block motion
# ---------------------------------------------------------------------------


def rigid_pose_from_markers(reference: np.ndarray, current: np.ndarray):
    """Best-fit rigid motion (ux, uy, theta) mapping reference markers of one
    block to their current positions (Kabsch in 2D)."""

    ref_c = reference.mean(axis=0)
    cur_c = current.mean(axis=0)
    r = reference - ref_c
    c = current - cur_c
    num = np.sum(r[:, 0] * c[:, 1] - r[:, 1] * c[:, 0])
    den = np.sum(r[:, 0] * c[:, 0] + r[:, 1] * c[:, 1])
    theta = np.arctan2(num, den) if (num != 0 or den != 0) else 0.0
    # Centroid displacement
    u = cur_c - ref_c
    return u[0], u[1], theta


def blocks_motion_from_marker_paths(
    marker_paths: np.ndarray,
    markers_per_block: np.ndarray,
    pixels_per_unit: float = 1.0,
    timestep: Optional[float] = None,
) -> np.ndarray:
    """Reduce marker pixel paths to per-block motion fields.

    Args:
        marker_paths: (T, n_markers, 2) tracked pixel positions.
        markers_per_block: (n_blocks, k) marker indices belonging to each
            block (k >= 1; rotation needs k >= 2).
        pixels_per_unit: scale to physical units. The pixel y-axis is
            flipped to the physical convention.
        timestep: if given, velocities are appended (central differences)
            and the result has shape (T, 2, n_blocks, 3) like
            ``SolutionData.fields``; otherwise (T, n_blocks, 3).
    """

    paths = marker_paths.astype(float).copy()
    paths[..., 1] *= -1.0  # image y points down
    paths /= pixels_per_unit
    T = paths.shape[0]
    n_blocks = len(markers_per_block)

    displacement = np.zeros((T, n_blocks, 3))
    for b, ids in enumerate(markers_per_block):
        ref = paths[0, ids]
        for t in range(T):
            displacement[t, b] = rigid_pose_from_markers(ref, paths[t, ids])

    if timestep is None:
        return displacement
    velocity = np.gradient(displacement, timestep, axis=0)
    return np.stack([displacement, velocity], axis=1)


# ---------------------------------------------------------------------------
# Damping identification
# ---------------------------------------------------------------------------


def damping_ratio_log_decrement(signal: np.ndarray) -> Tuple[float, np.ndarray]:
    """Damping ratio of a free decay via the logarithmic decrement of
    successive positive peaks. Returns (zeta, peak_indices)."""

    signal = np.asarray(signal)
    peaks = [
        i
        for i in range(1, len(signal) - 1)
        if signal[i] > signal[i - 1] and signal[i] > signal[i + 1] and signal[i] > 0
    ]
    peaks = np.asarray(peaks)
    if len(peaks) < 2:
        raise ValueError("Need at least two positive peaks for log decrement.")
    amplitudes = signal[peaks]
    deltas = np.log(amplitudes[:-1] / amplitudes[1:])
    delta = float(np.mean(deltas))
    zeta = delta / np.sqrt(4 * np.pi**2 + delta**2)
    return zeta, peaks
