"""AugMix operation set in JAX (device-side).

Re-implementation of the 13 PIL ops the reference bundles
(data/augmix_ops.py:56-148: autocontrast, equalize, posterize, rotate,
solarize, shear_x/y, translate_x/y, color, contrast, brightness, sharpness)
plus the level samplers (augmix_ops.py:24-53). Ops run on [H,W,3] float
images in [0,1]; geometric ops use bilinear resampling with zero fill,
matching PIL `resample=BILINEAR` affine/rotate semantics, with the PIL
convention that the affine matrix maps *output* to *input* coordinates.

These are default-dead capability in the reference (aug_list=[],
datautils.py:135-138) but part of its public surface; enable via
`TTLConfig`/`aug_ops` in ttl_tpu.ops.image.make_view_fn.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

IMAGE_SIZE = 224  # augmix_ops.py:21

AUG_NAMES = ("autocontrast", "equalize", "posterize", "rotate", "solarize",
             "shear_x", "shear_y", "translate_x", "translate_y",
             "color", "contrast", "brightness", "sharpness")
# augmix_ops.py:141-144 - the set AugMix actually samples from
DEFAULT_AUG_LIST = AUG_NAMES[:9]


def _sample_level(key, n):
    """uniform(0.1, n) (augmix_ops.py:52-53)."""
    return jax.random.uniform(key, minval=0.1, maxval=float(n))


def _int_parameter(level, maxval):
    return jnp.floor(level * maxval / 10.0)


def _float_parameter(level, maxval):
    return level * maxval / 10.0


def _signed(key, x):
    """Random sign flip with p=0.5 (augmix_ops.py:71-111)."""
    return jnp.where(jax.random.bernoulli(key), -x, x)


def _affine(img, a, b, c, d, e, f):
    """PIL Image.transform AFFINE: output(x,y) = input(a x + b y + c,
    d x + e y + f); bilinear, zero fill."""
    h, w = img.shape[:2]
    ys, xs = jnp.mgrid[0:h, 0:w]
    x_in = a * xs + b * ys + c
    y_in = d * xs + e * ys + f
    coords = jnp.stack([y_in, x_in])

    def chan(ci):
        return jax.scipy.ndimage.map_coordinates(ci, coords, order=1, cval=0.0)

    return jnp.stack([chan(img[..., i]) for i in range(3)], axis=-1)


def _rotate(img, degrees):
    h, w = img.shape[:2]
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    t = degrees * math.pi / 180.0  # PIL rotate() is counter-clockwise
    ca, sa = jnp.cos(t), jnp.sin(t)
    # inverse mapping about the center
    a, b = ca, -sa
    d, e = sa, ca
    c = cx - a * cx - b * cy
    f = cy - d * cx - e * cy
    return _affine(img, a, b, c, d, e, f)


def _grayscale(img):
    """PIL 'L' conversion weights."""
    return (0.299 * img[..., 0] + 0.587 * img[..., 1]
            + 0.114 * img[..., 2])[..., None]


def _blend(degenerate, img, factor):
    return jnp.clip(degenerate + factor * (img - degenerate), 0.0, 1.0)


# ------------------------------------------------------------------- the ops

def autocontrast(img, key, severity):
    lo = jnp.min(img, axis=(0, 1), keepdims=True)
    hi = jnp.max(img, axis=(0, 1), keepdims=True)
    scale = jnp.where(hi > lo, 1.0 / (hi - lo), 1.0)
    return jnp.where(hi > lo, (img - lo) * scale, img)


def equalize(img, key, severity):
    """PIL ImageOps.equalize integer LUT, per channel."""
    u8 = jnp.clip(jnp.round(img * 255.0), 0, 255).astype(jnp.int32)

    def chan(c):
        hist = jnp.zeros((256,), jnp.int32).at[c.reshape(-1)].add(1)
        nonzero = hist > 0
        last_nz = 255 - jnp.argmax(nonzero[::-1])
        step = (jnp.sum(hist) - hist[last_nz]) // 255
        n = step // 2
        cumsum = jnp.cumsum(hist)
        # lut[i] = (n + sum(hist[:i])) // step
        offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32), cumsum[:-1]])
        lut = jnp.where(step > 0, (n + offsets) // jnp.maximum(step, 1),
                        jnp.arange(256))
        lut = jnp.clip(lut, 0, 255)
        return lut[c]

    out = jnp.stack([chan(u8[..., i]) for i in range(3)], axis=-1)
    return out.astype(img.dtype) / 255.0


def posterize(img, key, severity):
    level = _int_parameter(_sample_level(key, severity), 4)
    bits_kept = 4 - level  # augmix_ops.py:64-66: ImageOps.posterize(img, 4-level)
    u8 = jnp.clip(jnp.round(img * 255.0), 0, 255)
    # PIL keeps the top `bits_kept` bits: quantization step 2^(8-bits_kept)
    step = jnp.power(2.0, 8.0 - bits_kept)
    return (jnp.floor(u8 / step) * step) / 255.0


def rotate(img, key, severity):
    k1, k2 = jax.random.split(key)
    degrees = _int_parameter(_sample_level(k1, severity), 30)
    return _rotate(img, _signed(k2, degrees))


def solarize(img, key, severity):
    level = _int_parameter(_sample_level(key, severity), 256)
    threshold = (256.0 - level) / 255.0
    return jnp.where(img >= threshold, 1.0 - img, img)


def shear_x(img, key, severity):
    k1, k2 = jax.random.split(key)
    level = _signed(k2, _float_parameter(_sample_level(k1, severity), 0.3))
    return _affine(img, 1.0, level, 0.0, 0.0, 1.0, 0.0)


def shear_y(img, key, severity):
    k1, k2 = jax.random.split(key)
    level = _signed(k2, _float_parameter(_sample_level(k1, severity), 0.3))
    return _affine(img, 1.0, 0.0, 0.0, level, 1.0, 0.0)


def translate_x(img, key, severity):
    k1, k2 = jax.random.split(key)
    level = _signed(k2, _int_parameter(_sample_level(k1, severity),
                                       IMAGE_SIZE / 3))
    return _affine(img, 1.0, 0.0, level, 0.0, 1.0, 0.0)


def translate_y(img, key, severity):
    k1, k2 = jax.random.split(key)
    level = _signed(k2, _int_parameter(_sample_level(k1, severity),
                                       IMAGE_SIZE / 3))
    return _affine(img, 1.0, 0.0, 0.0, 0.0, 1.0, level)


def _enh_level(key, severity):
    return _float_parameter(_sample_level(key, severity), 1.8) + 0.1


def color(img, key, severity):
    return _blend(jnp.broadcast_to(_grayscale(img), img.shape), img,
                  _enh_level(key, severity))


def contrast(img, key, severity):
    # PIL: degenerate = solid gray at round(mean of L histogram)
    mean = jnp.round(jnp.mean(_grayscale(img)) * 255.0) / 255.0
    return _blend(jnp.full_like(img, mean), img, _enh_level(key, severity))


def brightness(img, key, severity):
    return _blend(jnp.zeros_like(img), img, _enh_level(key, severity))


def sharpness(img, key, severity):
    # PIL SMOOTH 3x3 kernel [[1,1,1],[1,5,1],[1,1,1]]/13, edge-replicated
    kernel = jnp.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], img.dtype) / 13.0
    pad = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    smooth = jax.lax.conv_general_dilated(
        pad.transpose(2, 0, 1)[:, None], kernel[None, None],
        window_strides=(1, 1), padding="VALID")[:, 0].transpose(1, 2, 0)
    # PIL keeps the 1px border unfiltered
    h, w = img.shape[:2]
    border = (jnp.zeros((h, w), bool).at[0, :].set(True).at[-1, :].set(True)
              .at[:, 0].set(True).at[:, -1].set(True))
    smooth = jnp.where(border[..., None], img, smooth)
    return _blend(smooth, img, _enh_level(key, severity))


OPS = {name: fn for name, fn in zip(AUG_NAMES, (
    autocontrast, equalize, posterize, rotate, solarize, shear_x, shear_y,
    translate_x, translate_y, color, contrast, brightness, sharpness))}


def make_augmix_chain(aug_ops: Sequence[str], severity: int, image_size: int):
    """Build chain(img, key): apply depth~uniform{1,2,3} ops drawn uniformly
    with replacement from aug_ops (datautils.py:120-123)."""
    fns = [OPS[name] for name in aug_ops]

    branches = [lambda im, k, f=f: f(im, k, severity) for f in fns]

    def apply_op(img, idx, key):
        return jax.lax.switch(idx, branches, img, key)

    def chain(img, key):
        k_depth, k_ops, k_apply = jax.random.split(key, 3)
        depth = jax.random.randint(k_depth, (), 1, 4)
        op_idx = jax.random.randint(k_ops, (3,), 0, len(fns))
        keys = jax.random.split(k_apply, 3)

        def body(i, im):
            out = apply_op(im, op_idx[i], keys[i])
            return jnp.where(i < depth, out, im)

        return jax.lax.fori_loop(0, 3, body, img)

    return chain
