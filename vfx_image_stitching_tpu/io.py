"""Host-side data I/O: pano.txt parsing and image loading.

Replicates the reference's AutoStitch ``pano.txt`` heuristic exactly
(image_stitching_harris.py:10-44), including the quirk that an image line
with no space-free float-parsable line before the next image line is
silently dropped (this happens for ``wind/pano.txt`` — wind02.jpg has no
focal length recorded, so the wind "panorama" is a single image).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

try:  # pragma: no cover - environment probe
    import cv2  # type: ignore

    _HAVE_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAVE_CV2 = False


def read_pano_data(pano_file_path: str) -> Tuple[List[str], List[float]]:
    """Parse an AutoStitch ``pano.txt`` into (image paths, focal lengths).

    Heuristic (reference parity, image_stitching_harris.py:29-43):
      * any line containing ``.jpg`` or ``.png`` (case-insensitive) becomes
        the pending image path (stored with original case, stripped);
      * the next non-image line that has no internal space and parses as a
        float is taken as that image's focal length in pixels;
      * dimension / homography-matrix lines are skipped because they contain
        spaces; an image line with no focal before the next image line is
        dropped.
    """
    images: List[str] = []
    focuses: List[float] = []
    pending_img: Optional[str] = None

    with open(pano_file_path, "r", encoding="utf-8") as f:
        all_lines = f.read().splitlines()

    for text_line in all_lines:
        line_stripped = text_line.strip().lower()
        if (".jpg" in line_stripped) or (".png" in line_stripped):
            pending_img = text_line.strip()
        elif (" " not in line_stripped) and line_stripped:
            try:
                val = float(line_stripped)
            except ValueError:
                continue
            if pending_img is not None:
                images.append(pending_img)
                focuses.append(val)
                pending_img = None
    return images, focuses


def resolve_image_path(path: str, folder: str) -> str:
    """Reference path-fallback rule (image_stitching_harris.py:452).

    The shipped pano.txt files carry the author's absolute Windows paths, so
    the ``folder/basename`` fallback is the branch that actually fires.
    """
    if os.path.exists(path):
        return path
    # os.path.basename does not split Windows backslashes on POSIX; the
    # reference has the same behavior but its fallback still works because
    # basename of "C:\\...\\out00.jpg" contains the filename.  Handle both.
    base = os.path.basename(path.replace("\\", "/"))
    return os.path.join(folder, base)


def peek_image_size(folder: str, pano_file: Optional[str] = None
                    ) -> Optional[Tuple[int, int]]:
    """(height, width) of the dataset's first readable image, from the
    image header only (no pixel decode) — used to pick size-dependent
    capacities before the loader dispatches any device work.

    Returns None when no image is readable (the pipeline then keeps its
    configured capacities and degrades exactly as the reference does).
    """
    pf = pano_file or os.path.join(folder, "pano.txt")
    try:
        paths, _ = read_pano_data(pf)
    except OSError:
        return None
    for p in paths:
        fp = resolve_image_path(p, folder)
        try:
            from PIL import Image

            with Image.open(fp) as im:
                w, h = im.size  # header read only
            return int(h), int(w)
        except Exception:
            img = load_bgr(fp)
            if img is not None:
                return int(img.shape[0]), int(img.shape[1])
    return None


def load_bgr(path: str) -> Optional[np.ndarray]:
    """Load an image as BGR uint8 (cv2.imread parity); None if unreadable."""
    if _HAVE_CV2:
        img = cv2.imread(path)
        return img
    try:  # pragma: no cover - PIL fallback when cv2 is unavailable
        from PIL import Image

        with Image.open(path) as im:
            rgb = np.asarray(im.convert("RGB"), dtype=np.uint8)
        return rgb[..., ::-1].copy()
    except Exception:
        return None


def save_bgr(path: str, img: np.ndarray) -> None:
    """Write a BGR uint8 image (cv2.imwrite parity for .jpg output).

    Raises OSError on failure — cv2.imwrite only returns False (e.g. on a
    read-only directory), which callers otherwise cannot distinguish from
    success.
    """
    img = np.asarray(img, dtype=np.uint8)
    if _HAVE_CV2:
        if not cv2.imwrite(path, img):
            raise OSError(f"could not write image: {path}")
        return
    from PIL import Image  # pragma: no cover

    Image.fromarray(img[..., ::-1]).save(path, quality=95)


def load_dataset(
    folder: str, pano_file: Optional[str] = None
) -> Tuple[List[Optional[np.ndarray]], List[float], List[str]]:
    """Load a dataset folder: returns (BGR images or None, focals, paths).

    Mirrors the reference driver's load phase (image_stitching_harris.py:441-458):
    unreadable images become ``None`` placeholders that downstream stages
    tolerate (shift (0,0), dummy match pair).
    """
    if not folder.endswith(("/", "\\")):
        folder = folder + "/"
    if pano_file is None:
        pano_file = os.path.join(folder, "pano.txt")
    img_paths, focals = read_pano_data(pano_file)
    resolved = [resolve_image_path(p, folder) for p in img_paths]
    if len(resolved) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(8, len(resolved))) as pool:
            images = list(pool.map(load_bgr, resolved))
    else:
        images = [load_bgr(p) for p in resolved]
    return images, focals, resolved


def load_dataset_device(
    folder: str, pano_file: Optional[str] = None, with_host: bool = False,
    gray: bool = False, host_project: bool = False,
):
    """Load a dataset straight onto the device, overlapping decode with
    transfer.

    Each image is ``device_put`` as soon as its JPEG decode finishes (JAX
    transfers are asynchronous), so on slow host-device links the upload
    hides behind the remaining decodes.  Returns
    ``(cyl_input_batch (device, N,H,W,3 u8), valid mask, focals, shape)``
    where unreadable images are zero-filled with ``valid=False``.  With
    ``with_host=True`` a fifth element carries the decoded host arrays
    (``None`` per unreadable image) — the knife-edge escalation path uses
    them to avoid pulling images back off the device.  ``gray=True``
    uploads host-grayed (N, H, W) images instead — 1 byte/px for
    extraction-only device use (host-compose multi-dataset path); the
    reported ``shape`` stays the RGB one.
    """
    import concurrent.futures as cf

    import jax
    import jax.numpy as jnp

    if not folder.endswith(("/", "\\")):
        folder = folder + "/"
    if pano_file is None:
        pano_file = os.path.join(folder, "pano.txt")
    img_paths, focals = read_pano_data(pano_file)
    if not img_paths:
        raise ValueError("no valid entries in pano.txt")
    resolved = [resolve_image_path(p, folder) for p in img_paths]

    device_imgs, host_imgs, valid, shape = _decode_upload(
        resolved, with_host, gray=gray,
        project_focals=focals if (gray and host_project) else None,
    )
    batch = jnp.stack(device_imgs)
    if with_host:
        return batch, valid, focals, shape, host_imgs
    return batch, valid, focals, shape


def _validate_decoded(shapes: List[Optional[tuple]]):
    """Shared decode-validation tail: one shape, >= 1 readable image.

    Returns ``(shape, valid_mask)``; both loaders (_decode_upload and
    load_dataset_device_split) use this so the mixed-shape / all-
    unreadable policy can never drift between them.
    """
    shape_set = {s for s in shapes if s is not None}
    if len(shape_set) > 1:
        raise ValueError(f"dataset images disagree on shape: {shape_set}")
    if not shape_set:
        raise ValueError("no readable images in dataset")
    return next(iter(shape_set)), np.array([s is not None for s in shapes])


def _decode_upload(resolved: List[str], with_host: bool, gray: bool = False,
                   project_focals: Optional[List[float]] = None):
    """Threaded JPEG decode with per-image async device_put.

    With ``project_focals`` (gray mode only) each gray image is
    additionally cylindrically projected ON HOST before upload — the
    fixed-point gray conversion and the index-map gather are both
    per-pixel, so host projection is bit-identical to projecting on
    device while saving the device gather (~2 ms/img of gather-rate-
    bound device time, see geometry/cylindrical.py).
    """
    import concurrent.futures as cf

    import jax
    import jax.numpy as jnp

    if gray:
        from vfx_image_stitching_tpu.ops.color import bgr_to_gray_u8_np
    if project_focals is not None:
        from vfx_image_stitching_tpu.geometry.cylindrical import (
            cylindrical_project_host,
        )

    n = len(resolved)
    device_imgs: List[Optional[object]] = [None] * n
    host_imgs: List[Optional[np.ndarray]] = [None] * n
    shapes = [None] * n
    with cf.ThreadPoolExecutor(max_workers=min(8, n)) as pool:
        futs = {pool.submit(load_bgr, p): i for i, p in enumerate(resolved)}
        for fut in cf.as_completed(futs):
            i = futs[fut]
            img = fut.result()
            if img is not None:
                shapes[i] = img.shape
                up = bgr_to_gray_u8_np(img) if gray else img
                if project_focals is not None:
                    up = cylindrical_project_host(
                        up, float(project_focals[i])
                    )
                device_imgs[i] = jax.device_put(up)  # async transfer
                if with_host:
                    host_imgs[i] = img

    shape, valid = _validate_decoded(shapes)
    zero = None
    for i in range(n):
        if device_imgs[i] is None:
            if zero is None:
                zero = jnp.zeros(shape[:2] if gray else shape, jnp.uint8)
            device_imgs[i] = zero
    return device_imgs, host_imgs, valid, shape


def load_dataset_device_grouped(
    folder: str, pano_file: Optional[str] = None, group_target: int = 6,
    first_target: int = 0,
):
    """Grouped loader for the pipelined extract: per-group device stacks.

    Each group's stack only waits for its own uploads, so the feature
    extractor can start on group 1 while later groups are still in
    flight — on slow host-device links this hides most of the upload
    behind compute.  ``first_target > 0`` additionally shrinks the
    first group (e.g. 18 -> [2, 8, 8]) so the extractor's first input
    is ready sooner; measured on-chip (r3 A/B, one process,
    interleaved) it does NOT help — uploads are issued concurrently
    during decode, so the first stack's inputs arrive almost as fast
    either way and the extra group pays dispatch overhead (medians
    1.32 s uniform-6 vs 1.64 s [2,8,8]) — hence default 0.

    Returns ``(batches, valid, focals, shape, host_imgs)``.
    """
    import jax.numpy as jnp

    if not folder.endswith(("/", "\\")):
        folder = folder + "/"
    if pano_file is None:
        pano_file = os.path.join(folder, "pano.txt")
    img_paths, focals = read_pano_data(pano_file)
    if not img_paths:
        raise ValueError("no valid entries in pano.txt")
    resolved = [resolve_image_path(p, folder) for p in img_paths]

    device_imgs, host_imgs, valid, shape = _decode_upload(resolved, True)
    n = len(device_imgs)
    if first_target and n > first_target:
        rest = n - first_target
        g = pick_group_size(rest, group_target)
        starts = [0] + list(range(first_target, n, g))
        sizes = [first_target] + [g] * (rest // g)
    else:
        g = pick_group_size(n, group_target)
        starts = list(range(0, n, g))
        sizes = [g] * (n // g)
    batches = [
        jnp.stack(device_imgs[a : a + s]) for a, s in zip(starts, sizes)
    ]
    return batches, valid, focals, shape, host_imgs


def load_dataset_device_split(
    folder: str, pano_file: Optional[str] = None, group_target: int = 6,
    upload_rgb: bool = True, host_project: bool = False,
    on_group=None,
):
    """Gray-first grouped loader: only gray rides the critical path.

    Feature extraction consumes GRAY pixels (the fixed-point BGR2GRAY
    commutes exactly with the cylindrical index gather), while the RGB
    cylindrical batch is needed only by the final compose — ~0.5 s of
    extract/match/escalate later.  This loader therefore converts to
    gray on host (ops.color.bgr_to_gray_u8_np, bit-identical to the
    device op) and uploads the 1-byte/px gray images FIRST; the
    3-byte/px RGB uploads are submitted after every gray, so on a slow
    host-device link they queue behind the critical path and finish
    while the extractor runs.  RGB images are returned as an UNSTACKED
    device list — the caller stacks/projects them lazily at compose
    time so no device op ahead of the first sync waits on them.

    ``on_group(k, dev_stack, lo, hi, focals)`` — when given and group
    uploads are eager (VFX_GRAY_GROUP_UPLOAD=1) — fires from the loader
    thread the moment group ``k``'s gray stack lands on device, BEFORE
    later images decode.  The pipeline uses it to dispatch feature
    extraction per group so the device chews group 0 while the host is
    still decoding group 2 (decode of an 18-image dataset costs
    ~0.1-0.15 s of single-core JPEG work that otherwise serializes
    ahead of all device compute).  Every group fires exactly once
    (deferred groups fire in the post-decode fallback pass).

    Returns ``(gray_batches, rgb_imgs, valid, focals, shape, host_imgs)``.
    """
    import jax
    import jax.numpy as jnp

    from vfx_image_stitching_tpu.ops.color import bgr_to_gray_u8_np

    if not folder.endswith(("/", "\\")):
        folder = folder + "/"
    if pano_file is None:
        pano_file = os.path.join(folder, "pano.txt")
    img_paths, focals = read_pano_data(pano_file)
    if not img_paths:
        raise ValueError("no valid entries in pano.txt")
    resolved = [resolve_image_path(p, folder) for p in img_paths]

    import concurrent.futures as cf

    n = len(resolved)
    sizes = plan_group_sizes(n, group_target)
    starts = [0]
    for s in sizes[:-1]:
        starts.append(starts[-1] + s)
    group_of = []
    for k, s in enumerate(sizes):
        group_of.extend([k] * s)
    group_upload = os.environ.get("VFX_GRAY_GROUP_UPLOAD", "1") == "1"
    gray_imgs: List[Optional[np.ndarray]] = [None] * n
    host_imgs: List[Optional[np.ndarray]] = [None] * n
    shapes = [None] * n
    n_groups = len(sizes)
    remaining = list(sizes)
    group_dev: List[Optional[object]] = [None] * n_groups

    def _try_put_group(k, ref_shape):
        """Upload group k eagerly if complete and shape-consistent."""
        lo, hi = starts[k], starts[k] + sizes[k]
        grp = []
        for i in range(lo, hi):
            if gray_imgs[i] is not None:
                if shapes[i] != ref_shape:
                    return  # defer: canonical mixed-shape error later
                grp.append(gray_imgs[i])
            else:
                grp.append(np.zeros(ref_shape[:2], np.uint8))
        group_dev[k] = jax.device_put(np.stack(grp))
        if on_group is not None:
            on_group(k, group_dev[k], lo, hi, focals)

    # Few ORDERED workers when cores are scarce: decode completion then
    # tracks submission order, so the ramped first groups actually finish
    # first and the device starts ~25 ms earlier (A/B'd on the ~2-core
    # harness box, docs/CHIP_AB_R4B.json).  cv2 decode releases the GIL,
    # so on a genuinely multi-core host more workers parallelize real
    # decode work — there min(8, cores) wins on total load wall while
    # submission order still biases early groups first.
    cores = os.cpu_count() or 1
    default_workers = 2 if cores <= 2 else min(8, cores)
    n_workers = max(
        1, int(os.environ.get("VFX_DECODE_WORKERS", default_workers))
    )
    with cf.ThreadPoolExecutor(max_workers=min(n_workers, n)) as pool:
        futs = {pool.submit(load_bgr, p): i for i, p in enumerate(resolved)}
        for fut in cf.as_completed(futs):
            i = futs[fut]
            img = fut.result()
            if img is not None:
                shapes[i] = img.shape
                g_i = bgr_to_gray_u8_np(img)
                if host_project:
                    # bit-identical to the device gather; saves ~2 ms/img
                    # of gather-rate-bound device time (see _decode_upload)
                    from vfx_image_stitching_tpu.geometry.cylindrical import (
                        cylindrical_project_host,
                    )

                    g_i = cylindrical_project_host(g_i, float(focals[i]))
                gray_imgs[i] = g_i
                host_imgs[i] = img
            if group_upload:
                remaining[group_of[i]] -= 1
                ref = next((s for s in shapes if s is not None), None)
                if remaining[group_of[i]] == 0 and ref is not None:
                    _try_put_group(group_of[i], ref)
    shape, valid = _validate_decoded(shapes)
    for i in range(n):
        if gray_imgs[i] is None:
            gray_imgs[i] = np.zeros(shape[:2], np.uint8)
    # Default (VFX_GRAY_GROUP_UPLOAD=1, A/B'd on chip: 0.825 vs 0.866 s
    # medians interleaved): upload each GROUP's stack the moment its
    # images decode, so the first extract starts before later decodes
    # finish (3 transfers for 18 images).  VFX_GRAY_GROUP_UPLOAD=0
    # restores the single whole-dataset upload (18 per-IMAGE transfers
    # had lost to it on this link, measured r3 — per-group is the
    # middle ground that wins).  RGB uploads follow and are consumed
    # only at compose time.
    if group_upload:
        ref = shape
        for k in range(n_groups):
            if group_dev[k] is None:  # deferred or shape-deferred group
                _try_put_group(k, ref)
        gray_batches_eager = [group_dev[k] for k in range(n_groups)]
        gray_stack = None
    else:
        gray_stack = jax.device_put(np.stack(gray_imgs))
    rgb_imgs: List[Optional[object]] = [None] * n
    if upload_rgb:
        zero_rgb = None
        for i in range(n):
            if host_imgs[i] is not None:
                rgb_imgs[i] = jax.device_put(host_imgs[i])
            else:
                if zero_rgb is None:
                    zero_rgb = jnp.zeros(shape, jnp.uint8)
                rgb_imgs[i] = zero_rgb

    if group_upload:
        gray_batches = gray_batches_eager
    else:
        gray_batches = [
            gray_stack[a : a + s] for a, s in zip(starts, sizes)
        ]
    return gray_batches, rgb_imgs, valid, focals, shape, host_imgs


def plan_group_sizes(n: int, target: int = 6) -> List[int]:
    """Group-size schedule for the pipelined extract-on-load path.

    Uniform ``target``-sized groups gate the device on the first
    ``target`` JPEG decodes (~40 ms of single-core host work for a
    6-group) while the device sits idle.  A RAMP — ``[2, 4, target,
    ...]`` — starts extraction after two decodes; the single-core decode
    rate (~5.5 ms/img) outruns the extractor (~13 ms/img) from then on,
    so later, larger groups never starve it.  Only two extra executable
    shapes (2 and 4) are introduced, shared by every ramped dataset.

    The earlier refutation of a small first group (r3: uniform-6 beat
    [2, 8, 8], see ``load_dataset_device_grouped``) predates
    extract-on-load: back then extraction was dispatched only after the
    WHOLE load, so an early first stack bought nothing and the extra
    dispatch cost showed.  With per-group dispatch from the loader
    callback the early start is real (A/B: docs/CHIP_AB_R4B.json).

    Falls back to uniform :func:`pick_group_size` groups when the ramp
    does not tile ``n`` exactly, or under ``VFX_RAMP_GROUPS=0``.
    """
    ramp_on = os.environ.get("VFX_RAMP_GROUPS", "1") == "1"
    if ramp_on and n >= 2 * target and target >= 3 and n % target == 0:
        lead = [2, target - 2]
        return lead + [target] * (n // target - 1)
    g = pick_group_size(n, target)
    return [g] * (n // g)


def pick_group_size(n: int, target: int = 6) -> int:
    """Largest divisor of ``n`` that is <= target (1 = no grouping).

    Used by the pipelined extract: groups must tile the dataset exactly
    so every group reuses one compiled executable shape.
    """
    for g in range(min(target, n), 1, -1):
        if n % g == 0:
            return g
    return n  # prime or tiny n: a single group (monolithic)


def stack_dataset(
    images: Sequence[Optional[np.ndarray]],
) -> Tuple[np.ndarray, np.ndarray]:
    """Stack same-shape images into (N, H, W, 3) uint8 + validity mask.

    ``None`` entries are replaced by zeros with ``valid=False`` so the
    batched device pipeline keeps fixed shapes; callers consult the mask to
    reproduce the reference's degraded-mode behavior
    (image_stitching_harris.py:479-482).
    """
    shapes = {im.shape for im in images if im is not None}
    if len(shapes) > 1:
        raise ValueError(f"dataset images disagree on shape: {shapes}")
    if not shapes:
        raise ValueError("no readable images in dataset")
    shape = next(iter(shapes))
    batch = np.zeros((len(images),) + shape, dtype=np.uint8)
    valid = np.zeros((len(images),), dtype=bool)
    for i, im in enumerate(images):
        if im is not None:
            batch[i] = im
            valid[i] = True
    return batch, valid
