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


def fit_damped_oscillation(
    signal: np.ndarray,
    framerate: float,
    peak_distance: int = 12,
    min_peak_fraction: float = 0.02,
) -> dict:
    """Identify a free damped oscillation: damping ratio + frequencies.

    The reference's method (scripts/tracking/damping_ratio.py:14-213):
    detrend the angle signal, find its positive peaks, fit a line to
    ``log(peaks)`` vs time (slope ``m = -zeta * omega_n``), take the damped
    frequency ``omega_d`` from the FFT maximum, and combine
    ``zeta = 1 / sqrt(1 + (omega_d / m)^2)`` (exact for a linear oscillator
    since ``omega_d = omega_n sqrt(1 - zeta^2)``).

    Returns a dict with ``zeta``, ``omega_d``, ``frequency_d`` (Hz),
    ``omega_n``, ``log_slope``, and ``peak_indices``.
    """

    signal = np.asarray(signal, dtype=float)
    t = np.arange(len(signal)) / framerate
    # Linear detrend (not mean-only): a slow baseline drift shifts late
    # noise peaks positive, letting them pass the noise-floor filter below
    # and biasing the log-decay slope.
    drift = np.polyval(np.polyfit(t, signal, 1), t)
    detrended = signal - drift

    # Positive peaks separated by at least peak_distance samples.
    candidates = np.nonzero(
        (detrended[1:-1] > detrended[:-2])
        & (detrended[1:-1] > detrended[2:])
        & (detrended[1:-1] > 0)
    )[0] + 1
    peaks = []
    for idx in candidates:
        if not peaks or idx - peaks[-1] >= peak_distance:
            peaks.append(int(idx))
        elif detrended[idx] > detrended[peaks[-1]]:
            peaks[-1] = int(idx)
    peaks = np.asarray(peaks)
    if len(peaks) >= 1:
        # Discard the post-decay noise floor: keep peaks above a fraction
        # of the largest peak (the reference fits short videos where this
        # never matters; long signals need it for an unbiased log fit).
        peaks = peaks[
            detrended[peaks] >= min_peak_fraction * detrended[peaks].max()
        ]
    if len(peaks) < 3:
        raise ValueError("Need at least three peaks to fit the decay.")

    slope, _ = np.polyfit(t[peaks], np.log(detrended[peaks]), 1)

    spectrum = np.abs(np.fft.rfft(detrended))
    freqs = np.fft.rfftfreq(len(detrended), d=1.0 / framerate)
    spectrum[0] = 0.0
    frequency_d = float(freqs[np.argmax(spectrum)])
    omega_d = 2 * np.pi * frequency_d
    zeta = 1.0 / np.sqrt(1.0 + (omega_d / slope) ** 2)
    return dict(
        zeta=float(zeta),
        omega_d=float(omega_d),
        frequency_d=frequency_d,
        omega_n=float(omega_d / np.sqrt(1 - zeta**2)),
        log_slope=float(slope),
        peak_indices=peaks,
    )


# ---------------------------------------------------------------------------
# Frame preprocessing and threshold selection
# ---------------------------------------------------------------------------


def preprocess_frame(
    frame: np.ndarray,
    blur_size: int = 5,
    threshold: int = 127,
    adaptive_thresholding: bool = False,
    adaptive_block: int = 51,
    morphological: bool = True,
    inverted: bool = False,
) -> np.ndarray:
    """Grayscale -> blur -> (adaptive) threshold -> optional morphological
    open/close; the reference's preprocessing chain
    (scripts/tracking/tracking_gray_xcorr.py:21-34, utils.py:25-28).
    Returns the binary mask."""

    import cv2

    if frame.ndim == 3:
        frame = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
    if inverted:
        frame = 255 - frame
    if blur_size > 1:
        blur_size += 1 - blur_size % 2  # odd kernel
        frame = cv2.GaussianBlur(frame, (blur_size, blur_size), 0)
    if adaptive_thresholding:
        adaptive_block += 1 - adaptive_block % 2
        mask = cv2.adaptiveThreshold(
            frame, 255, cv2.ADAPTIVE_THRESH_GAUSSIAN_C, cv2.THRESH_BINARY,
            adaptive_block, -int(threshold),
        )
    else:
        _, mask = cv2.threshold(frame, threshold, 255, cv2.THRESH_BINARY)
    if morphological:
        kernel = np.ones((3, 3), np.uint8)
        mask = cv2.morphologyEx(mask, cv2.MORPH_OPEN, kernel)
        mask = cv2.morphologyEx(mask, cv2.MORPH_CLOSE, kernel)
    return mask


def get_contour_centroids(
    frame: np.ndarray,
    roi_xy: Optional[Tuple[Tuple[int, int], Tuple[int, int]]] = None,
    blur_size: int = 5,
    threshold: int = 127,
    block_area: Tuple[float, float] = (4.0, 1e6),
    **preprocess_kwargs,
) -> np.ndarray:
    """Centroids (n, 2) of block contours after preprocessing, optionally
    restricted to a ``((x0, x1), (y0, y1))`` region of interest (the
    reference's get_contours, tracking_gray_xcorr.py:36-55)."""

    import cv2

    offset = np.zeros(2)
    if roi_xy is not None:
        (x0, x1), (y0, y1) = roi_xy
        frame = frame[y0:y1, x0:x1]
        offset = np.array([x0, y0], dtype=float)
    mask = preprocess_frame(frame, blur_size, threshold, **preprocess_kwargs)
    contours, _ = cv2.findContours(
        mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
    )
    centroids = []
    for contour in contours:
        area = cv2.contourArea(contour)
        if not (block_area[0] <= area <= block_area[1]):
            continue
        m = cv2.moments(contour)
        if m["m00"] > 0:
            centroids.append(
                (m["m10"] / m["m00"] + offset[0], m["m01"] / m["m00"] + offset[1])
            )
    return np.asarray(centroids).reshape(-1, 2)


def pick_threshold(
    frame: np.ndarray,
    thresholds: Optional[np.ndarray] = None,
    expected_count: Optional[int] = None,
    blur_size: int = 5,
    block_area: Tuple[float, float] = (4.0, 1e6),
    **preprocess_kwargs,
) -> Tuple[int, np.ndarray]:
    """Headless replacement for the reference's interactive threshold picker
    (scripts/tracking/pick_thresholding.py): sweep thresholds and return the
    one in the middle of the widest plateau of constant contour count (or,
    with ``expected_count``, the widest plateau at that count), plus the
    (threshold, count) sweep table for inspection."""

    if thresholds is None:
        thresholds = np.arange(10, 250, 5)
    counts = np.array(
        [
            len(
                get_contour_centroids(
                    frame,
                    blur_size=blur_size,
                    threshold=int(th),
                    block_area=block_area,
                    **preprocess_kwargs,
                )
            )
            for th in thresholds
        ]
    )
    table = np.stack([thresholds, counts], axis=1)
    # Plateaus: maximal runs of equal nonzero count.
    best = None
    start = 0
    for k in range(1, len(counts) + 1):
        if k == len(counts) or counts[k] != counts[start]:
            run = (start, k)  # [start, k)
            if counts[start] > 0 and (
                expected_count is None or counts[start] == expected_count
            ):
                if best is None or (run[1] - run[0]) > (best[1] - best[0]):
                    best = run
            start = k
    if best is None:
        raise ValueError(
            "No threshold plateau found"
            + (f" with {expected_count} contours" if expected_count else "")
        )
    return int(thresholds[(best[0] + best[1] - 1) // 2]), table


# ---------------------------------------------------------------------------
# Sub-pixel cross-correlation marker tracking
# ---------------------------------------------------------------------------


def find_markers_xcorr(
    template_frame: np.ndarray,
    search_frame: np.ndarray,
    template_markers: np.ndarray,
    search_markers: np.ndarray,
    search_window_size: int = 40,
    marker_template_size: int = 20,
    upscaling_factor: int = 5,
) -> np.ndarray:
    """Sub-pixel marker positions by normalized cross-correlation.

    For each marker: crop a template around its position in
    ``template_frame``, crop a search window around its last known position
    in ``search_frame``, upscale both bicubically by ``upscaling_factor``
    and take the argmax of ``cv2.matchTemplate(TM_CCORR_NORMED)`` — the
    reference's xcorr tracker (scripts/tracking/utils.py:194-265), ~1/5 px
    resolution at the default upscaling.
    """

    import cv2

    template_frame = np.asarray(template_frame)
    search_frame = np.asarray(search_frame)
    out = np.array(search_markers, dtype=float, copy=True)
    h_t, w_t = template_frame.shape[:2]
    h_s, w_s = search_frame.shape[:2]

    for i, ((x, y), (xs, ys)) in enumerate(
        zip(np.asarray(template_markers, float), np.asarray(search_markers, float))
    ):
        half_t = marker_template_size / 2
        half_s = search_window_size / 2
        ty0, ty1 = int(max(y - half_t, 0)), int(min(y + half_t, h_t))
        tx0, tx1 = int(max(x - half_t, 0)), int(min(x + half_t, w_t))
        sy0, sy1 = int(max(ys - half_s, 0)), int(min(ys + half_s, h_s))
        sx0, sx1 = int(max(xs - half_s, 0)), int(min(xs + half_s, w_s))
        template = template_frame[ty0:ty1, tx0:tx1]
        window = search_frame[sy0:sy1, sx0:sx1]
        if template.size == 0 or window.size == 0:
            raise ValueError(f"Marker {i} at {(x, y)} fell outside the frame.")
        template = cv2.resize(
            template, None, fx=upscaling_factor, fy=upscaling_factor,
            interpolation=cv2.INTER_CUBIC,
        )
        window = cv2.resize(
            window, None, fx=upscaling_factor, fy=upscaling_factor,
            interpolation=cv2.INTER_CUBIC,
        )
        if (
            window.shape[0] < template.shape[0]
            or window.shape[1] < template.shape[1]
        ):
            raise ValueError(
                f"Search window {window.shape} smaller than template "
                f"{template.shape} for marker {i}."
            )
        xcorr = cv2.matchTemplate(window, template, cv2.TM_CCORR_NORMED)
        _, _, _, max_loc = cv2.minMaxLoc(xcorr)
        # Template center position within the (upscaled) search window.
        cx = (max_loc[0] + template.shape[1] / 2) / upscaling_factor
        cy = (max_loc[1] + template.shape[0] / 2) / upscaling_factor
        # Template crop center relative to the nominal marker position
        # corrects for clamping at frame borders.
        out[i, 0] = sx0 + cx - ((tx0 + tx1) / 2 - x)
        out[i, 1] = sy0 + cy - ((ty0 + ty1) / 2 - y)
    return out


def track_video_xcorr(
    video_path: Union[str, Path],
    initial_markers: np.ndarray,
    search_window_size: int = 40,
    marker_template_size: int = 20,
    upscaling_factor: int = 5,
    template: str = "first",
    max_frames: Optional[int] = None,
) -> np.ndarray:
    """Track markers through a video with the sub-pixel xcorr tracker;
    returns (n_frames, n_markers, 2) pixel paths.

    ``template='first'`` correlates every frame against the first frame's
    marker templates (no drift accumulation, the reference's mode);
    ``'previous'`` re-templates every frame (robust to appearance change).
    """

    import cv2

    cap = cv2.VideoCapture(str(video_path))
    paths = []
    template_frame = None
    template_markers = None
    markers = np.asarray(initial_markers, dtype=float)
    while True:
        ok, frame = cap.read()
        if not ok or (max_frames is not None and len(paths) >= max_frames):
            break
        if frame.ndim == 3:
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        if template_frame is None:
            template_frame, template_markers = frame, markers
        else:
            markers = find_markers_xcorr(
                template_frame, frame, template_markers, markers,
                search_window_size, marker_template_size, upscaling_factor,
            )
            if template == "previous":
                template_frame, template_markers = frame, markers
        paths.append(markers.copy())
    cap.release()
    if not paths:
        raise IOError(f"No readable frames in {video_path}.")
    return np.stack(paths)


# ---------------------------------------------------------------------------
# Field post-processing
# ---------------------------------------------------------------------------


def interpolate_nans(fields: np.ndarray) -> np.ndarray:
    """Linearly interpolate NaN gaps along the time axis (axis 0) of any
    field array (the reference's utils.interpolate_nans)."""

    fields = np.array(fields, dtype=float, copy=True)
    flat = fields.reshape(fields.shape[0], -1)
    t = np.arange(fields.shape[0])
    for j in range(flat.shape[1]):
        bad = np.isnan(flat[:, j])
        if bad.any() and (~bad).any():
            flat[bad, j] = np.interp(t[bad], t[~bad], flat[~bad, j])
    return flat.reshape(fields.shape)


def smooth_fields_convolution(fields: np.ndarray, kernel_size: int = 3) -> np.ndarray:
    """Moving-average smoothing along time (reference utils.py:383-410),
    edge-padded so the output length matches."""

    fields = np.asarray(fields, dtype=float)
    kernel = np.ones(kernel_size) / kernel_size
    pad = kernel_size // 2
    flat = fields.reshape(fields.shape[0], -1)
    padded = np.pad(flat, ((pad, kernel_size - 1 - pad), (0, 0)), mode="edge")
    out = np.stack(
        [np.convolve(padded[:, j], kernel, mode="valid") for j in range(flat.shape[1])],
        axis=1,
    )
    return out.reshape(fields.shape)


def smooth_fields_savgol(
    fields: np.ndarray, window_length: int = 5, polyorder: int = 2
) -> np.ndarray:
    """Savitzky-Golay smoothing along time (reference utils.py:413-448)."""

    from scipy.signal import savgol_filter

    return savgol_filter(
        np.asarray(fields, dtype=float), window_length, polyorder, axis=0
    )
