"""Native image pipeline (native/image_ops.cpp): PIL equivalence of the
fused decode->resize->crop->flip, thread-pool batch parity, transform
integration, and graceful fallback. The reference relies on torch's C++
DataLoader workers for this (SURVEY §2.4); here the decode path itself is
native and GIL-releasing."""
import io
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.fast  # sub-minute unit subset (pre-commit gate)

sys.path.insert(0, os.path.dirname(__file__))

from PIL import Image

from unlearn_ft_tpu.native import load_image_ops

ops = load_image_ops()
needs_native = pytest.mark.skipif(ops is None, reason="toolchain/libjpeg missing")


def _jpeg_bytes(w, h, seed=0, quality=95):
    rng = np.random.default_rng(seed)
    # smooth-ish content: JPEG is lossy, so pure noise maximizes codec error;
    # gradients + noise resemble photos (what the loaders actually decode)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack([xx * 255 / w, yy * 255 / h, (xx + yy) * 127 / (w + h)], -1)
    img = np.clip(base + rng.normal(0, 12, (h, w, 3)), 0, 255).astype(np.uint8)
    b = io.BytesIO()
    Image.fromarray(img).save(b, "JPEG", quality=quality)
    return b.getvalue()


@needs_native
def test_probe_matches_pil():
    data = _jpeg_bytes(187, 123)
    assert ops.probe_jpeg(data) == Image.open(io.BytesIO(data)).size


@needs_native
@pytest.mark.parametrize("src,geom", [
    ((187, 123), (98, 64, 17, 0, False)),    # downscale
    ((50, 40), (80, 64, 5, 0, True)),        # upscale + flip
    ((640, 480), (85, 64, 10, 0, False)),    # big downscale (wide filter)
])
def test_decode_resize_crop_matches_pil(src, geom):
    """Fused native path == PIL resize(BILINEAR)+crop(+flip) within PIL's
    8-bit fixed-point coefficient rounding (<=1 level, tiny mean)."""
    w, h = src
    rw, rh, left, top, flip = geom
    res = 64
    data = _jpeg_bytes(w, h, seed=w)
    out = ops.decode_resize_crop(data, rw, rh, res, left, top, flip)
    ref = Image.open(io.BytesIO(data)).convert("RGB").resize(
        (rw, rh), Image.BILINEAR).crop((left, top, left + res, top + res))
    ref = np.asarray(ref)
    if flip:
        ref = ref[:, ::-1]
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 1 and diff.mean() < 0.02, (diff.max(), diff.mean())


@needs_native
def test_batch_matches_sequential_and_threads():
    res = 32
    items, singles = [], []
    for i, (w, h) in enumerate([(100, 80), (64, 64), (200, 150), (40, 90)]):
        data = _jpeg_bytes(w, h, seed=i)
        scale = res / min(w, h)
        rw, rh = round(w * scale), round(h * scale)
        left, top = (rw - res) // 2, (rh - res) // 2
        items.append((data, rw, rh, left, top, i % 2 == 0))
        singles.append(ops.decode_resize_crop(data, rw, rh, res, left, top, i % 2 == 0))
    for threads in (1, 3, 8):
        batch = ops.batch_decode_resize_crop(items, res, threads)
        assert batch.shape == (4, res, res, 3)
        for k in range(4):
            np.testing.assert_array_equal(batch[k], singles[k])


@needs_native
def test_errors_raise_value_error():
    with pytest.raises(ValueError):
        ops.probe_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        ops.decode_resize_crop(b"nope", 8, 8, 8, 0, 0, False)
    with pytest.raises(ValueError):  # crop out of bounds
        ops.decode_resize_crop(_jpeg_bytes(32, 32), 16, 16, 24, 0, 0, False)


def test_transform_from_path_matches_pil_transform(tmp_path):
    """image_transform.from_path (native or PIL fallback) == the PIL
    transform for the deterministic center-crop/no-flip configuration."""
    from unlearn_ft_tpu.data.preprocess import image_transform

    p = tmp_path / "img.jpg"
    p.write_bytes(_jpeg_bytes(123, 97, seed=7))
    t = image_transform(48, center_crop=True, random_flip=False)
    a = t.from_path(str(p))
    b = t(Image.open(str(p)))
    assert a.shape == b.shape == (48, 48, 3) and a.dtype == np.float32
    # both normalize uint8/127.5-1: <=1 level = 1/127.5
    assert np.abs(a - b).max() <= (1.0 / 127.5) + 1e-6
    # batch wrapper covers the same files
    outs = t.from_paths([str(p), str(p)], num_threads=2)
    assert len(outs) == 2
    np.testing.assert_allclose(outs[0], a, atol=1e-6)


def test_transform_from_path_falls_back_for_png(tmp_path):
    """Non-JPEG inputs silently take the PIL path."""
    from unlearn_ft_tpu.data.preprocess import image_transform

    arr = (np.linspace(0, 255, 64 * 48 * 3).reshape(48, 64, 3)).astype(np.uint8)
    p = tmp_path / "img.png"
    Image.fromarray(arr).save(str(p))
    t = image_transform(32, center_crop=True, random_flip=False)
    a = t.from_path(str(p))
    b = t(Image.open(str(p)))
    np.testing.assert_allclose(a, b, atol=1e-6)
    outs = t.from_paths([str(p)])
    np.testing.assert_allclose(outs[0], a, atol=1e-6)


def test_lazy_images_uses_from_path(tmp_path):
    from unlearn_ft_tpu.data.preprocess import LazyImages, image_transform

    p = tmp_path / "img.jpg"
    p.write_bytes(_jpeg_bytes(80, 64, seed=3))

    class Rec:
        image = str(p)

    t = image_transform(32, center_crop=True, random_flip=False)
    li = LazyImages([Rec()], t)
    out = li[0]
    assert out.shape == (32, 32, 3)
    np.testing.assert_allclose(out, t.from_path(str(p)), atol=1e-6)


def test_env_kill_switch(monkeypatch, tmp_path):
    """UNLEARN_FT_TPU_NO_NATIVE forces the PIL path (fresh cache)."""
    import unlearn_ft_tpu.native as native

    monkeypatch.setattr(native, "_CACHE", {"mod": None, "tried": False})
    monkeypatch.setenv("UNLEARN_FT_TPU_NO_NATIVE", "1")
    assert native.load_image_ops() is None


@needs_native
def test_native_decode_throughput_vs_pil():
    """Informational: single-thread fused native vs PIL on a 640x480->512
    chain. Asserts only that native is not pathologically slow (>0.5x PIL);
    the real win is the GIL-releasing pool (printed for the record)."""
    import time

    data = _jpeg_bytes(640, 480, seed=11)
    res, n = 256, 20
    scale = res / 480
    rw, rh = round(640 * scale), round(480 * scale)
    left, top = (rw - res) // 2, 0

    t0 = time.perf_counter()
    for _ in range(n):
        ops.decode_resize_crop(data, rw, rh, res, left, top, False)
    native_s = (time.perf_counter() - t0) / n
    t0 = time.perf_counter()
    for _ in range(n):
        np.asarray(Image.open(io.BytesIO(data)).convert("RGB")
                   .resize((rw, rh), Image.BILINEAR)
                   .crop((left, top, left + res, top + res)))
    pil_s = (time.perf_counter() - t0) / n
    t0 = time.perf_counter()
    items = [(data, rw, rh, left, top, False)] * n
    ops.batch_decode_resize_crop(items, res, 8)
    pool_s = (time.perf_counter() - t0) / n
    print(f"\nnative {1/native_s:.0f} img/s, PIL {1/pil_s:.0f} img/s, "
          f"pool(8) {1/pool_s:.0f} img/s")
    assert native_s < 2.0 * pil_s
