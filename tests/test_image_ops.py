"""Device-side view pipeline + AugMix op tests.

PIL (via torchvision's transform stack, the reference's host pipeline) is the
oracle: deterministic ops must match closely; random-parameter ops are
checked through their deterministic cores and by distribution.
"""
import numpy as np
import pytest
from PIL import Image, ImageEnhance, ImageOps

import jax
import jax.numpy as jnp

from ttl_tpu.ops import augmix as am
from ttl_tpu.ops import image as im


@pytest.fixture(scope="module")
def photo():
    """Synthetic structured test image (gradients + shapes), 224x224."""
    rng = np.random.RandomState(0)
    x = np.zeros((224, 224, 3), np.float32)
    gy, gx = np.mgrid[0:224, 0:224]
    x[..., 0] = gx / 223.0
    x[..., 1] = gy / 223.0
    x[..., 2] = ((gx // 32 + gy // 32) % 2)
    x += rng.rand(224, 224, 3) * 0.1
    return np.clip(x, 0, 1).astype(np.float32)


def to_pil(x):
    return Image.fromarray((x * 255).round().astype(np.uint8))


def from_pil(p):
    return np.asarray(p, np.float32) / 255.0


def psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return 10 * np.log10(1.0 / max(mse, 1e-12))


# ------------------------------------------------------------- deterministic

def test_autocontrast_matches_pil(photo):
    ours = np.asarray(am.autocontrast(jnp.asarray(photo), None, 1))
    ref = from_pil(ImageOps.autocontrast(to_pil(photo)))
    assert psnr(ours, ref) > 40


def test_equalize_matches_pil(photo):
    ours = np.asarray(am.equalize(jnp.asarray(photo), None, 1))
    ref = from_pil(ImageOps.equalize(to_pil(photo)))
    assert psnr(ours, ref) > 40


def test_posterize_core_matches_pil(photo):
    # fix bits=2 by bypassing the level sampler
    u8 = (photo * 255).round().astype(np.uint8)
    ref = from_pil(ImageOps.posterize(to_pil(photo), 2))
    step = 2 ** 6
    ours = (np.floor((photo * 255).round() / step) * step) / 255.0
    assert psnr(ours, ref) > 45
    assert np.asarray(u8).shape == (224, 224, 3)


def test_solarize_core_matches_pil(photo):
    ref = from_pil(ImageOps.solarize(to_pil(photo), 128))
    x = jnp.asarray(photo)
    ours = np.asarray(jnp.where(x >= 128 / 255.0, 1.0 - x, x))
    assert psnr(ours, ref) > 40


def test_rotate_matches_pil(photo):
    ref = from_pil(to_pil(photo).rotate(17, resample=Image.BILINEAR))
    ours = np.asarray(am._rotate(jnp.asarray(photo), jnp.float32(17.0)))
    assert psnr(ours, ref) > 28  # subpixel-resampling differences only


def test_shear_matches_pil(photo):
    lvl = 0.2
    ref = from_pil(to_pil(photo).transform(
        (224, 224), Image.AFFINE, (1, lvl, 0, 0, 1, 0),
        resample=Image.BILINEAR))
    ours = np.asarray(am._affine(jnp.asarray(photo), 1.0, lvl, 0.0,
                                 0.0, 1.0, 0.0))
    assert psnr(ours, ref) > 30


def test_translate_matches_pil(photo):
    ref = from_pil(to_pil(photo).transform(
        (224, 224), Image.AFFINE, (1, 0, 30, 0, 1, 0),
        resample=Image.BILINEAR))
    ours = np.asarray(am._affine(jnp.asarray(photo), 1.0, 0.0, 30.0,
                                 0.0, 1.0, 0.0))
    assert psnr(ours, ref) > 35


@pytest.mark.parametrize("enh,deg", [
    ("Color", 0.5), ("Contrast", 1.4), ("Brightness", 0.7),
    ("Sharpness", 1.6)])
def test_enhance_matches_pil(photo, enh, deg):
    ref = from_pil(getattr(ImageEnhance, enh)(to_pil(photo)).enhance(deg))
    x = jnp.asarray(photo)
    if enh == "Color":
        ours = am._blend(jnp.broadcast_to(am._grayscale(x), x.shape), x, deg)
    elif enh == "Contrast":
        mean = jnp.round(jnp.mean(am._grayscale(x)) * 255.0) / 255.0
        ours = am._blend(jnp.full_like(x, mean), x, deg)
    elif enh == "Brightness":
        ours = am._blend(jnp.zeros_like(x), x, deg)
    else:
        ours = am.sharpness(x, jax.random.PRNGKey(0), 1)  # random level
        assert np.isfinite(np.asarray(ours)).all()
        return
    assert psnr(np.asarray(ours), ref) > 33


# ------------------------------------------------------------- view pipeline

def test_center_view_matches_torchvision(photo):
    # no torchvision in this env; on PIL inputs torchvision Resize/CenterCrop
    # are exactly PIL resize(BICUBIC) + center crop, so PIL is the oracle
    src = (np.clip(photo[:160], 0, 1) * 255).round().astype(np.uint8)
    pil = Image.fromarray(src)
    h0, w0 = src.shape[:2]
    short = min(h0, w0)
    rh, rw = round(224 * h0 / short), round(224 * w0 / short)
    resized = pil.resize((rw, rh), Image.BICUBIC)
    left, top = (rw - 224) // 2, (rh - 224) // 2
    ref = np.asarray(resized.crop((left, top, left + 224, top + 224)),
                     np.float32).transpose(2, 0, 1) / 255.0

    canvas = np.zeros((256, 256, 3), np.uint8)
    canvas[:160, :224] = src
    ours = im.preprocess_center(jnp.asarray(canvas), jnp.int32(160),
                                jnp.int32(224))
    # undo CLIP normalization for comparison
    mean = np.asarray(im.CLIP_MEAN).reshape(3, 1, 1)
    std = np.asarray(im.CLIP_STD).reshape(3, 1, 1)
    ours01 = np.asarray(ours) * std + mean
    assert psnr(ours01, ref) > 25


def test_view_fn_shapes_and_determinism(photo):
    canvas = np.zeros((256, 256, 3), np.uint8)
    canvas[:224, :224] = (photo * 255).astype(np.uint8)
    fn = jax.jit(im.make_view_fn(8, 64, out_dtype=jnp.float32))
    v1 = fn(jnp.asarray(canvas), jnp.int32(224), jnp.int32(224),
            jax.random.PRNGKey(5))
    v2 = fn(jnp.asarray(canvas), jnp.int32(224), jnp.int32(224),
            jax.random.PRNGKey(5))
    assert v1.shape == (8, 3, 64, 64)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    v3 = fn(jnp.asarray(canvas), jnp.int32(224), jnp.int32(224),
            jax.random.PRNGKey(6))
    assert not np.allclose(np.asarray(v1)[1:], np.asarray(v3)[1:])
    # view 0 (clean) is key-independent
    np.testing.assert_array_equal(np.asarray(v1)[0], np.asarray(v3)[0])


def _tv_rrc_params(rng, h, w, scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)):
    """torchvision RandomResizedCrop.get_params, re-derived in numpy (no
    torchvision in this env): 10 attempts, log-uniform ratio, center
    fallback."""
    area = h * w
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        log_ratio = rng.uniform(np.log(ratio[0]), np.log(ratio[1]))
        r = np.exp(log_ratio)
        cw = int(round(np.sqrt(target_area * r)))
        ch = int(round(np.sqrt(target_area / r)))
        if 0 < cw <= w and 0 < ch <= h:
            i = rng.randint(0, h - ch + 1)
            j = rng.randint(0, w - cw + 1)
            return i, j, ch, cw
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw, ch = w, int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        ch, cw = h, int(round(h * ratio[1]))
    else:
        cw, ch = w, h
    return (h - ch) // 2, (w - cw) // 2, ch, cw


def test_rrc_box_distribution_matches_torchvision():
    """Crop area/aspect statistics must match RandomResizedCrop sampling."""
    h, w = 300, 400
    n = 2000
    boxes = jax.vmap(lambda k: im.sample_rrc_box(
        k, jnp.int32(h), jnp.int32(w)))(
        jax.random.split(jax.random.PRNGKey(0), n))
    boxes = np.asarray(boxes)
    areas = boxes[:, 2] * boxes[:, 3] / (h * w)
    ratios = boxes[:, 3] / boxes[:, 2]
    assert (boxes[:, 0] >= 0).all() and (boxes[:, 1] >= 0).all()
    assert (boxes[:, 0] + boxes[:, 2] <= h + 1e-3).all()
    assert (boxes[:, 1] + boxes[:, 3] <= w + 1e-3).all()

    rng = np.random.RandomState(0)
    ref = np.array([_tv_rrc_params(rng, h, w) for _ in range(n)], np.float32)
    ref_areas = ref[:, 2] * ref[:, 3] / (h * w)
    ref_ratios = ref[:, 3] / ref[:, 2]
    assert abs(areas.mean() - ref_areas.mean()) < 0.03
    assert abs(np.log(ratios).mean() - np.log(ref_ratios).mean()) < 0.03


def test_augmix_chain_runs(photo):
    fn = jax.jit(im.make_view_fn(4, 64, aug_ops=am.DEFAULT_AUG_LIST,
                                 out_dtype=jnp.float32))
    canvas = np.zeros((256, 256, 3), np.uint8)
    canvas[:224, :224] = (photo * 255).astype(np.uint8)
    v = fn(jnp.asarray(canvas), jnp.int32(224), jnp.int32(224),
           jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(v)).all()
    assert v.shape == (4, 3, 64, 64)


def test_posterize_op_matches_pil_at_severity_1(photo):
    """severity=1 pins the sampled level to 0 -> bits_kept=4, so the op is
    deterministic and must equal ImageOps.posterize(img, 4) exactly."""
    ours = np.asarray(am.posterize(jnp.asarray(photo),
                                   jax.random.PRNGKey(3), 1))
    ref = from_pil(ImageOps.posterize(to_pil(photo), 4))
    assert psnr(ours, ref) > 45
