"""Batched subpixel localization via masked Newton iterations.

Parity with ``localize_extremum_via_quadratic_fit`` (sift_impl.py:169-211)
including its quirks:
  * at most 5 iterations; convergence = all |update| < 0.5 *before* moving;
  * a candidate that exhausts the iterations without converging is still
    accepted, with (x, y, layer) from its *last move* but cube/grad/update
    from the last *compute* (the loop falls through at sift_impl.py:195);
  * moves are banker's-rounded; a move out of bounds rejects the point;
  * contrast then 2x2-Hessian edge tests on the stored state;
  * ``kp.octave`` packs octave + layer<<8 + round((offset+0.5)*255)<<16.

The reference solves with ``np.linalg.lstsq``; the batched device version
uses a closed-form adjugate solve (the Hessian is essentially never
singular at an extremum; a zero-determinant candidate gets update=0 and
dies in the contrast test — a measured-immaterial deviation).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vfx_image_stitching_tpu.config import SiftConfig


class Localized(NamedTuple):
    x: jnp.ndarray          # i32 final column
    y: jnp.ndarray          # i32 final row
    layer: jnp.ndarray      # i32 final layer in [1, num_intervals]
    update: jnp.ndarray     # (K, 3) f32 final Newton step
    pt_x: jnp.ndarray       # f32 keypoint coords at base-image scale
    pt_y: jnp.ndarray
    size: jnp.ndarray       # f32
    response: jnp.ndarray   # f32
    octave_packed: jnp.ndarray  # i32
    valid: jnp.ndarray      # bool


def _gradient(cube: jnp.ndarray) -> jnp.ndarray:
    """Central differences on a (..., 3, 3, 3) cube (sift_impl.py:217-224)."""
    dx = 0.5 * (cube[..., 1, 1, 2] - cube[..., 1, 1, 0])
    dy = 0.5 * (cube[..., 1, 2, 1] - cube[..., 1, 0, 1])
    ds = 0.5 * (cube[..., 2, 1, 1] - cube[..., 0, 1, 1])
    return jnp.stack([dx, dy, ds], axis=-1)


def _hessian(cube: jnp.ndarray) -> jnp.ndarray:
    """3x3 Hessian (sift_impl.py:227-240)."""
    v = cube[..., 1, 1, 1]
    dxx = cube[..., 1, 1, 2] - 2 * v + cube[..., 1, 1, 0]
    dyy = cube[..., 1, 2, 1] - 2 * v + cube[..., 1, 0, 1]
    dss = cube[..., 2, 1, 1] - 2 * v + cube[..., 0, 1, 1]
    dxy = 0.25 * (cube[..., 1, 2, 2] - cube[..., 1, 2, 0]
                  - cube[..., 1, 0, 2] + cube[..., 1, 0, 0])
    dxs = 0.25 * (cube[..., 2, 1, 2] - cube[..., 2, 1, 0]
                  - cube[..., 0, 1, 2] + cube[..., 0, 1, 0])
    dys = 0.25 * (cube[..., 2, 2, 1] - cube[..., 2, 0, 1]
                  - cube[..., 0, 2, 1] + cube[..., 0, 0, 1])
    row0 = jnp.stack([dxx, dxy, dxs], axis=-1)
    row1 = jnp.stack([dxy, dyy, dys], axis=-1)
    row2 = jnp.stack([dxs, dys, dss], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def _solve3(hess: jnp.ndarray, grad: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 3x3 solve via adjugate; zero update if singular."""
    a = hess
    c00 = a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1]
    c01 = a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2]
    c02 = a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]
    det = a[..., 0, 0] * c00 + a[..., 0, 1] * c01 + a[..., 0, 2] * c02
    adj = jnp.stack(
        [
            jnp.stack([c00,
                       a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2],
                       a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1]], -1),
            jnp.stack([c01,
                       a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0],
                       a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2]], -1),
            jnp.stack([c02,
                       a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1],
                       a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]], -1),
        ],
        axis=-2,
    )
    sol = jnp.einsum("...ij,...j->...i", adj, grad)
    safe_det = jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
    return jnp.where(
        (jnp.abs(det) > 1e-30)[..., None], sol / safe_det[..., None], 0.0
    )


def localize_candidates(
    dog: jnp.ndarray,
    layer: jnp.ndarray,
    y: jnp.ndarray,
    x: jnp.ndarray,
    cand_valid: jnp.ndarray,
    octave: int,
    cfg: SiftConfig,
) -> Localized:
    """Run the masked Newton loop for all candidates of one octave."""
    h, w = dog.shape[-2:]
    border = cfg.image_border_width
    k = layer.shape[0]

    def gather_cube(l, yy, xx):
        return jax.lax.dynamic_slice(dog, (l - 1, yy - 1, xx - 1), (3, 3, 3))

    gather = jax.vmap(gather_cube)

    def body(_t, st):
        (xs, ys, ls, cube, grad, update, hess, converged, rejected) = st
        active = ~(converged | rejected)
        new_cube = gather(ls, ys, xs).astype(jnp.float32) / 255.0
        new_grad = _gradient(new_cube)
        new_hess = _hessian(new_cube)
        new_update = -_solve3(new_hess, new_grad)

        cube = jnp.where(active[:, None, None, None], new_cube, cube)
        grad = jnp.where(active[:, None], new_grad, grad)
        hess = jnp.where(active[:, None, None], new_hess, hess)
        update = jnp.where(active[:, None], new_update, update)

        conv_now = jnp.all(jnp.abs(new_update) < 0.5, axis=-1)
        converged = converged | (active & conv_now)

        move = jnp.rint(new_update).astype(jnp.int32)
        moving = active & ~conv_now
        nx = xs + move[:, 0]
        ny = ys + move[:, 1]
        nl = ls + move[:, 2]
        oob = (
            (ny < border) | (ny >= h - border)
            | (nx < border) | (nx >= w - border)
            | (nl < 1) | (nl > cfg.num_intervals)
        )
        rejected = rejected | (moving & oob)
        # clip so later (ignored) gathers stay in range
        xs = jnp.where(moving, jnp.clip(nx, 1, w - 2), xs)
        ys = jnp.where(moving, jnp.clip(ny, 1, h - 2), ys)
        ls = jnp.where(moving, jnp.clip(nl, 1, cfg.num_intervals), ls)
        return (xs, ys, ls, cube, grad, update, hess, converged, rejected)

    st = (
        x, y, layer,
        jnp.zeros((k, 3, 3, 3), jnp.float32),
        jnp.zeros((k, 3), jnp.float32),
        jnp.zeros((k, 3), jnp.float32),
        jnp.zeros((k, 3, 3), jnp.float32),
        jnp.zeros((k,), bool),
        jnp.zeros((k,), bool),
    )
    xs, ys, ls, cube, grad, update, hess, converged, rejected = (
        jax.lax.fori_loop(0, cfg.max_localize_iters, body, st)
    )

    val = cube[:, 1, 1, 1] + 0.5 * jnp.einsum("ki,ki->k", grad, update)
    contrast_ok = jnp.abs(val) * cfg.num_intervals >= cfg.contrast_threshold

    h2_tr = hess[:, 0, 0] + hess[:, 1, 1]
    h2_det = hess[:, 0, 0] * hess[:, 1, 1] - hess[:, 0, 1] * hess[:, 1, 0]
    er = cfg.eigen_ratio
    edge_ok = (h2_det > 0) & (er * h2_tr * h2_tr < ((er + 1.0) ** 2) * h2_det)

    valid = cand_valid & ~rejected & contrast_ok & edge_ok

    scale_o = jnp.float32(2.0**octave)
    pt_x = (xs.astype(jnp.float32) + update[:, 0]) * scale_o
    pt_y = (ys.astype(jnp.float32) + update[:, 1]) * scale_o
    octave_packed = (
        octave
        + ls * 256
        + jnp.rint((update[:, 2] + 0.5) * 255.0).astype(jnp.int32) * 65536
    ).astype(jnp.int32)
    size = (
        cfg.sigma
        * jnp.exp2((ls.astype(jnp.float32) + update[:, 2]) / cfg.num_intervals)
        * (2.0 ** (octave + 1))
    )
    return Localized(
        x=xs, y=ys, layer=ls, update=update,
        pt_x=pt_x, pt_y=pt_y, size=size,
        response=jnp.abs(val), octave_packed=octave_packed, valid=valid,
    )
