"""Native (C++/libjpeg) decode path tests; skipped if the toolchain can't
build the library."""
import os

import numpy as np
import pytest
from PIL import Image

from ttl_tpu.data import native_decode
from ttl_tpu.data.views import SampleLoader, load_canvas

pytestmark = pytest.mark.skipif(not native_decode.available(),
                                reason="native decoder unavailable")


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    d = tmp_path_factory.mktemp("jpegs")
    rng = np.random.RandomState(0)
    paths = []
    for i, (h, w) in enumerate([(375, 500), (800, 600), (1200, 1600),
                                (100, 80)]):
        gy, gx = np.mgrid[0:h, 0:w]
        img = np.stack([(gx * 255 // max(w, 1)),
                        (gy * 255 // max(h, 1)),
                        ((gx + gy) % 256)], axis=-1).astype(np.uint8)
        img = np.clip(img + rng.randint(0, 20, img.shape), 0, 255
                      ).astype(np.uint8)
        p = str(d / f"img{i}.jpg")
        Image.fromarray(img).save(p, quality=90)
        paths.append(p)
    return paths


def test_batch_decode_matches_pil(jpegs):
    n = len(jpegs)
    canv = np.zeros((n, 512, 512, 3), np.uint8)
    hs = np.zeros((n,), np.int32)
    ws = np.zeros((n,), np.int32)
    ok = native_decode.decode_batch(jpegs, canv, hs, ws)
    assert ok.all()
    for i, p in enumerate(jpegs):
        pc, ph, pw = load_canvas(p, 512)
        # same geometry
        assert abs(int(hs[i]) - ph) <= 1 and abs(int(ws[i]) - pw) <= 1
        h = min(int(hs[i]), ph)
        w = min(int(ws[i]), pw)
        diff = np.abs(canv[i, :h, :w].astype(int) - pc[:h, :w].astype(int))
        # no-resize path is exact; resize path differs by filter (bilinear
        # vs bicubic) but must be visually identical on smooth content
        assert diff.mean() < 6.0, (p, diff.mean())
        # padding stays zero
        assert (canv[i, int(hs[i]):, :] == 0).all()


def test_bad_file_falls_back(tmp_path, jpegs):
    bad = str(tmp_path / "not_a.jpg")
    with open(bad, "wb") as f:
        f.write(b"this is not a jpeg")
    canv = np.zeros((2, 128, 128, 3), np.uint8)
    hs = np.zeros((2,), np.int32)
    ws = np.zeros((2,), np.int32)
    ok = native_decode.decode_batch([jpegs[0], bad], canv, hs, ws)
    assert ok[0] and not ok[1]
    assert hs[1] == 0  # caller's fallback signal


def test_loader_uses_native_and_matches_fallback(jpegs, monkeypatch):
    class DS:
        def __len__(self):
            return len(jpegs)

        def __getitem__(self, i):
            return jpegs[i], i

    batches_native = list(SampleLoader(DS(), batch_size=2, shuffle=False,
                                       canvas=256))
    monkeypatch.setenv("TTL_NATIVE_DECODE", "0")
    native_decode._load.cache_clear()
    try:
        batches_pil = list(SampleLoader(DS(), batch_size=2, shuffle=False,
                                        canvas=256))
    finally:
        native_decode._load.cache_clear()
    for bn, bp in zip(batches_native, batches_pil):
        np.testing.assert_array_equal(bn.heights, bp.heights)
        diff = np.abs(bn.canvases.astype(int) - bp.canvases.astype(int))
        assert diff.mean() < 6.0
