"""NumPy test oracles transcribing the *semantics* of the reference stages.

These are independent reimplementations of the documented behaviors
(SURVEY.md section 2) used only to validate the TPU implementations on
tiny inputs; the framework itself never calls them.
"""

from __future__ import annotations

import numpy as np


def pad_image(img: np.ndarray, move_x: float, move_y: float) -> np.ndarray:
    """Translate-by-zero-pad (image_stitching_harris.py:311-325 semantics)."""
    mx = int(np.round(move_x))
    my = int(np.round(move_y))
    top, bottom = (my, 0) if my >= 0 else (0, -my)
    left, right = (mx, 0) if mx >= 0 else (0, -mx)
    return np.pad(img, ((top, bottom), (left, right), (0, 0)), "constant")


def blend_two_images(shift_vec, ref_match, img_a, img_b) -> np.ndarray:
    """Counter-alpha column blend (image_stitching_harris.py:327-376)."""
    dx, dy = shift_vec
    if dx < 0:
        dx, dy = -dx, -dy
        ref_match = (ref_match[1], ref_match[0])
        img_a, img_b = img_b, img_a

    pad_a_x = img_b.shape[1] - img_a.shape[1] + ref_match[0][0] - ref_match[1][0]
    pad_b_x = ref_match[0][0] - ref_match[1][0]
    overlap_range = ref_match[1][0] - ref_match[0][0] + img_a.shape[1]

    shift_a = pad_image(img_a, -pad_a_x, -dy)
    shift_b = pad_image(img_b, pad_b_x, dy)

    hh = max(shift_a.shape[0], shift_b.shape[0])
    ww = max(shift_a.shape[1], shift_b.shape[1])
    canvas_a = np.zeros((hh, ww, 3), np.float32)
    canvas_b = np.zeros((hh, ww, 3), np.float32)
    canvas_a[: shift_a.shape[0], : shift_a.shape[1]] = shift_a
    canvas_b[: shift_b.shape[0], : shift_b.shape[1]] = shift_b

    result = np.zeros((hh, ww, 3), np.float32)
    counter = 0
    for cc in range(ww):
        col_a = canvas_a[:, cc, :]
        col_b = canvas_b[:, cc, :]
        has_a = np.count_nonzero(col_a) > 0
        has_b = np.count_nonzero(col_b) > 0
        if has_a and has_b:
            alpha = counter / overlap_range if overlap_range != 0 else 0
            counter += 1
            result[:, cc, :] = (1 - alpha) * col_a + alpha * col_b
        elif has_a:
            result[:, cc, :] = col_a
        elif has_b:
            result[:, cc, :] = col_b
    return result.astype(np.uint8)


def compose_sequence(cyl_images, shifts, pairs) -> np.ndarray:
    """Sequential fold of pass 2 (image_stitching_harris.py:523-534)."""
    mosaic = cyl_images[0].copy()
    for i in range(1, len(cyl_images)):
        if cyl_images[i] is None:
            continue
        img = cyl_images[i]
        diff_y = mosaic.shape[0] - img.shape[0]
        if diff_y != 0:
            img = pad_image(img, 0, diff_y)
        mosaic = blend_two_images(shifts[i - 1], pairs[i - 1], mosaic, img)
    return mosaic


def rectangle_crop(img, black_threshold, extra_margin, gray_fn) -> np.ndarray:
    """Bounding-box crop, y-only margin (image_stitching_harris.py:381-420)."""
    h = img.shape[0]
    gray = gray_fn(img)
    mask = gray > black_threshold
    coords = np.where(mask)
    if coords[0].size == 0:
        return img
    y_min, y_max = coords[0].min(), coords[0].max()
    x_min, x_max = coords[1].min(), coords[1].max()
    y_min = max(0, y_min + extra_margin)
    y_max = min(h - 1, y_max - extra_margin)
    if y_min > y_max or x_min > x_max:
        return img
    return img[y_min : y_max + 1, x_min : x_max + 1]


def nn_match(kps_a, desc_a, kps_b, desc_b, desc_thresh):
    """First-min NN matching (image_stitching_harris.py:219-240)."""
    matches = []
    for i in range(len(desc_a)):
        best, best_j = np.inf, -1
        for j in range(len(desc_b)):
            d = desc_a[i] - desc_b[j]
            dist = float(np.dot(d, d))
            if dist < best:
                best, best_j = dist, j
        if best < desc_thresh:
            matches.append((tuple(kps_a[i]), tuple(kps_b[best_j])))
    return matches


def vote_ransac(matches, dist_sq_thresh=3):
    """Exhaustive translation voting (image_stitching_harris.py:242-271)."""
    if len(matches) == 0:
        return (0, 0), None
    moves = [(a[0] - b[0], a[1] - b[1]) for a, b in matches]
    best_score, best_move, best_pair = -1, (0, 0), None
    for i, (dx0, dy0) in enumerate(moves):
        votes = sum(
            1 for (dx, dy) in moves if (dx - dx0) ** 2 + (dy - dy0) ** 2 < dist_sq_thresh
        )
        if votes > best_score:
            best_score, best_move, best_pair = votes, (dx0, dy0), matches[i]
    return best_move, best_pair
